"""CLI smoke tests, torch pretrained import, eval driver with run averaging."""

import dataclasses
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cspn_tpu.models.torch_import import convert_resnet_state_dict
from cspn_tpu.train.state import partial_restore


def _fake_torch_resnet18_sd():
    """Minimal torchvision-format resnet18 state dict (numpy stand-ins)."""
    rng = np.random.default_rng(0)
    sd = {
        "conv1.weight": rng.standard_normal((64, 3, 7, 7)).astype(np.float32),
        "bn1.weight": np.ones(64, np.float32),
        "bn1.bias": np.zeros(64, np.float32),
        "bn1.running_mean": rng.standard_normal(64).astype(np.float32),
        "bn1.running_var": np.abs(rng.standard_normal(64)).astype(np.float32),
        "fc.weight": rng.standard_normal((1000, 512)).astype(np.float32),
    }
    chans = {1: (64, 64), 2: (64, 128), 3: (128, 256), 4: (256, 512)}
    for s, (cin, cout) in chans.items():
        for b in range(2):
            base = f"layer{s}.{b}"
            c_in = cin if b == 0 else cout
            sd[f"{base}.conv1.weight"] = rng.standard_normal(
                (cout, c_in, 3, 3)
            ).astype(np.float32)
            sd[f"{base}.conv2.weight"] = rng.standard_normal(
                (cout, cout, 3, 3)
            ).astype(np.float32)
            for j in (1, 2):
                sd[f"{base}.bn{j}.weight"] = np.ones(cout, np.float32)
                sd[f"{base}.bn{j}.bias"] = np.zeros(cout, np.float32)
                sd[f"{base}.bn{j}.running_mean"] = np.zeros(cout, np.float32)
                sd[f"{base}.bn{j}.running_var"] = np.ones(cout, np.float32)
            if b == 0 and s > 1:
                sd[f"{base}.downsample.0.weight"] = rng.standard_normal(
                    (cout, cin, 1, 1)
                ).astype(np.float32)
                sd[f"{base}.downsample.1.weight"] = np.ones(cout, np.float32)
                sd[f"{base}.downsample.1.bias"] = np.zeros(cout, np.float32)
                sd[f"{base}.downsample.1.running_mean"] = np.zeros(cout, np.float32)
                sd[f"{base}.downsample.1.running_var"] = np.ones(cout, np.float32)
    return sd


def test_torch_import_into_model():
    from cspn_tpu.models import cspn_unet_resnet18

    sd = _fake_torch_resnet18_sd()
    p_tree, s_tree = convert_resnet_state_dict(sd)

    model = cspn_unet_resnet18(cspn_steps=1, cspn_backend="reference")
    x = jnp.zeros((1, 32, 48, 4))
    variables = model.init(jax.random.PRNGKey(0), x)
    new_params = partial_restore(variables["params"], {**p_tree})
    # encoder layer conv got the torch weights (transposed OIHW->HWIO)
    got = np.asarray(new_params["encoder"]["layer1_0"]["conv1"]["kernel"])
    want = np.transpose(sd["layer1.0.conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(got, want)
    # 4-channel stem kept its init (3ch pretrained shape mismatch)
    got_stem = np.asarray(new_params["encoder"]["conv1_1"]["kernel"])
    assert got_stem.shape == (7, 7, 4, 64)
    orig_stem = np.asarray(variables["params"]["encoder"]["conv1_1"]["kernel"])
    np.testing.assert_array_equal(got_stem, orig_stem)
    # batch stats map into the wrapper's inner BatchNorm path
    new_stats = partial_restore(variables["batch_stats"], s_tree)
    np.testing.assert_allclose(
        np.asarray(new_stats["encoder"]["bn1"]["BatchNorm_0"]["mean"]),
        sd["bn1.running_mean"],
    )


@pytest.mark.slow
def test_eval_driver_run_averaging(tmp_path):
    from cspn_tpu.config import PRESETS
    from cspn_tpu.train.evaluate import run_eval

    cfg = dataclasses.replace(
        PRESETS["synthetic_smoke"],
        save_dir=str(tmp_path / "run"),
        best_model_dir=str(tmp_path / "run"),
    )
    out = run_eval(cfg, runs=2, dump_images=True, max_batches=2)
    assert len(out["runs"]) == 2
    assert np.isfinite(out["mean"]["RMSE"])
    # runs differ (sparse points re-sampled per run)
    assert out["runs"][0]["RMSE"] != out["runs"][1]["RMSE"]
    dumped = list((tmp_path / "run" / "eval_result").glob("*_pred.png"))
    assert len(dumped) >= 2


@pytest.mark.slow
def test_cli_demo_2d():
    from cspn_tpu.cli import main

    main(["demo", "--dim-num", "2", "--prop-step", "3", "--iter-num", "2",
          "--batch-size", "1"])


def test_cli_parses_train_config_overrides():
    from cspn_tpu.cli import _build_config, main
    import argparse

    parser_args = argparse.Namespace(
        preset="synthetic_smoke", dataset=None, train_list=None, eval_list=None,
        root_dir=None, n_sample=123, batch_size_train=None, batch_size_eval=None,
        model="resnet34", no_cspn=False, cspn_step=7, cspn_norm_type="8sum_abs",
        cspn_backend="reference", lr=0.5, num_epoch=2, loss="berhu",
        save_dir="/tmp/x", best_model_dir=None, resume=False, pretrain_path=None,
        mesh_data=None, mesh_spatial=1,
    )
    cfg = _build_config(parser_args)
    assert cfg.data.n_sample == 123
    assert cfg.model.arch == "resnet34"
    assert cfg.model.cspn_steps == 7
    assert cfg.model.cspn_norm_type == "8sum_abs"
    assert cfg.optim.lr == 0.5 and cfg.optim.num_epochs == 2
    assert cfg.optim.loss == "berhu"
    assert cfg.save_dir == "/tmp/x"
