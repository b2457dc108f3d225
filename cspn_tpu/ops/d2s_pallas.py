"""Pallas depth-to-space (2x) for the sub-pixel decoder -- kept NON-DEFAULT.

The sub-pixel decoder (models/decoder.py:SubpixelUnpoolConv) computes each
`zero-insert-unpool -> conv` pair of the reference decoder
(cspn_pytorch/models/torch_resnet_cspn_nyu.py:162-240) as one half-resolution
conv producing 4 phase groups, followed by a depth-to-space interleave.  XLA
lowers that interleave (reshape -> transpose -> reshape) to TWO physical
relayout passes per tensor, measured at ~7 ms/step of the flagship eval at
batch 64 -- ~2.7x the one-pass HBM floor.

This kernel does the permutation in ONE pass over HBM.  Mosaic has no
lane<->sublane shape casts (reshape (W,2C)->(2W,C) does not compile, nor do
expand_dims stacks, jnp.repeat, or sublane concats of lane-offset slices),
so the column interleave rides the MXU: with phase-channel layout
(px*2+py)*C + c, one pair of permutation-matrix matmuls per input row

    Y = Pa @ row[:, :2C] + Pb @ row[:, 2C:]      # (2W, 2C)
    Pa[2x, x] = 1, Pb[2x+1, x] = 1

yields BOTH full-resolution output rows at once (Y[:, :C] is row 2y, Y[:, C:]
row 2y+1; row interleave is free -- rows live on the untiled block dim).  A
permutation matmul is exact in bf16 (single nonzero term, f32 accumulate) and
f32 (bf16x3 decomposition), so the kernel is bit-identical to the jnp
formulation, forward and adjoint (verified on hardware).

MEASURED RESULT 2 (v5e, 2026-08-21, scripts/d2s_probe.py ->
result/d2s_probe.json): four XLA-level reformulations (py-major
slice + minor-merge + row-stack, strided .at[::2].set scatter, dilated
pad+add, py-major single transpose) were benched against the production
px-major reshape/transpose/reshape at all five flagship decoder shapes
with chained-varying inputs and full-reduction coupling.  The production
formulation is fastest or tied at every shape (e.g. 29x38x1024:
3.2 ms = 4.6x one-pass SoL; the alternatives 3.2-4.4 ms); the relayout
floor on this hardware is shuffle-throughput-bound no matter how it is
expressed.  Treat ~4-6x SoL as the cost of depth-to-space here.

MEASURED RESULT (v5e, 2026-08-19): the kernel does NOT beat XLA in-model and
is therefore not wired in.  Per-row small matmuls + lane-offset stores leave
it at ~2.3-2.4 ms for the [64,57,76,256]bf16 level (vs 1.9 ms for XLA's
two-pass lowering in-model, 0.35 ms one-pass floor); grid-over-rows and
statically-unrolled variants measured the same, and it is far worse at tiny
channel counts ([64,114,152,32]f32 head: 11 ms vs 2.3).  The relayout cost
on this hardware generation is dominated by cross-lane/sublane shuffle
throughput, which the MXU detour does not avoid.  Kept (with bit-exactness
tests) as the record of that negative result and as a base for revisiting on
hardware with native shape-cast support; `depth_to_space2` defaults to the
jnp formulation everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT_BYTES = 100 * 1024 * 1024
# per-buffer cap: keeps in+out blocks (double-buffered) comfortably in VMEM
_BLOCK_BYTES_CAP = 8 * 1024 * 1024


def _pad(v: int, m: int) -> int:
    return v + (-v) % m


def _block_bytes(hb: int, w: int, c4: int, itemsize: int) -> int:
    # input block (hb, w, 4C) + output block (2hb, ow<=2w, C), tile padded
    inb = hb * _pad(w, 8) * _pad(c4, 128) * itemsize
    outb = 2 * hb * _pad(2 * w, 8) * _pad(c4 // 4, 128) * itemsize
    return inb + outb


def _pick_hb(h: int, w: int, c4: int, itemsize: int) -> int:
    hb = h
    while hb > 1 and _block_bytes(hb, w, c4, itemsize) > _BLOCK_BYTES_CAP:
        hb = (hb + 1) // 2
    return hb


def fits_vmem(shape, itemsize: int = 4) -> bool:
    _, h, w, c4 = shape
    return _block_bytes(_pick_hb(h, w, c4, itemsize), w, c4, itemsize) * 2 <= (
        _VMEM_LIMIT_BYTES
    )


def _interpret_default() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except RuntimeError:
        return True


def depth_to_space2_jnp(x: jnp.ndarray, oheight: int, owidth: int) -> jnp.ndarray:
    """Reference formulation: [N,H,W,4C] -> [N,2H,2W,C] -> crop.

    Channel layout (px*2+py)*C + c -> output pixel (2y+py, 2x+px, c).
    """
    n, h, w, c4 = x.shape
    c = c4 // 4
    v = x.reshape(n, h, w, 2, 2, c)  # [..., px, py, c]
    y = v.transpose(0, 1, 4, 2, 3, 5).reshape(n, 2 * h, 2 * w, c)
    return y[:, :oheight, :owidth, :]


def _perm_mats(w: int, dtype):
    """Pa[2x, x] = 1 and Pb[2x+1, x] = 1, shape (2w, w)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (2 * w, w), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (2 * w, w), 1)
    return (r == 2 * x).astype(dtype), (r == 2 * x + 1).astype(dtype)


_DN = (((1,), (0,)), ((), ()))  # plain matmul dimension numbers


def _d2s_kernel(x_ref, o_ref, *, c: int, ow: int):
    hb, w = x_ref.shape[1], x_ref.shape[2]
    pa, pb = _perm_mats(w, x_ref.dtype)

    def row(i, _):
        xr = x_ref[0, i]  # (w, 4C)
        y = jax.lax.dot_general(
            pa, xr[:, : 2 * c], _DN, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            pb, xr[:, 2 * c :], _DN, preferred_element_type=jnp.float32
        )
        y = y.astype(o_ref.dtype)  # (2w, 2C): [:, :C] row 2y, [:, C:] row 2y+1
        o_ref[0, 2 * i] = y[:ow, :c]
        o_ref[0, 2 * i + 1] = y[:ow, c : 2 * c]
        return 0

    jax.lax.fori_loop(0, hb, row, 0)


def _s2d_kernel(ct_ref, g_ref, *, c: int, oh: int, ow: int, w: int):
    blk = pl.program_id(1)
    hb = g_ref.shape[1]
    pa, pb = _perm_mats(w, ct_ref.dtype)
    zpad = None
    if ow < 2 * w:
        zpad = jnp.zeros((2 * w - ow, c), ct_ref.dtype)

    def load(r_local):
        gi = blk * 2 * hb + r_local
        row = ct_ref[0, r_local]  # (ow, C); garbage beyond oh
        row = jnp.where(gi < oh, row, jnp.zeros_like(row))
        if zpad is not None:  # adjoint of the column crop
            row = jnp.concatenate([row, zpad], axis=0)
        return row  # (2w, C)

    def row(i, _):
        y = jnp.concatenate([load(2 * i), load(2 * i + 1)], axis=-1)  # (2w, 2C)
        ga = jax.lax.dot_general(
            pa, y, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        gb = jax.lax.dot_general(
            pb, y, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        g_ref[0, i] = jnp.concatenate([ga, gb], axis=-1).astype(g_ref.dtype)
        return 0

    jax.lax.fori_loop(0, hb, row, 0)


def _d2s_impl(x, oheight, owidth, interpret):
    n, h, w, c4 = x.shape
    c = c4 // 4
    hb = _pick_hb(h, w, c4, x.dtype.itemsize)
    grid = (n, pl.cdiv(h, hb))
    return pl.pallas_call(
        functools.partial(_d2s_kernel, c=c, ow=owidth),
        grid=grid,
        in_specs=[pl.BlockSpec((1, hb, w, c4), lambda ni, hi: (ni, hi, 0, 0))],
        out_specs=pl.BlockSpec((1, 2 * hb, owidth, c), lambda ni, hi: (ni, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, oheight, owidth, c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(x)


def _s2d_impl(ct, x_shape, x_dtype, interpret):
    n, h, w, c4 = x_shape
    c = c4 // 4
    oh, ow = ct.shape[1], ct.shape[2]
    ct = ct.astype(x_dtype)
    hb = _pick_hb(h, w, c4, ct.dtype.itemsize)
    grid = (n, pl.cdiv(h, hb))
    return pl.pallas_call(
        functools.partial(_s2d_kernel, c=c, oh=oh, ow=ow, w=w),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 2 * hb, ow, c), lambda ni, hi: (ni, hi, 0, 0))],
        out_specs=pl.BlockSpec((1, hb, w, c4), lambda ni, hi: (ni, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c4), x_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(ct)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _d2s(x, oheight, owidth, interpret):
    return _d2s_impl(x, oheight, owidth, interpret)


def _d2s_fwd(x, oheight, owidth, interpret):
    # residual: zero-length slice of x -- carries shape[1:]/dtype at no cost
    return _d2s_impl(x, oheight, owidth, interpret), x[:0]


def _d2s_bwd(oheight, owidth, interpret, res, ct):
    x_shape = (ct.shape[0],) + res.shape[1:]
    return (_s2d_impl(ct, x_shape, res.dtype, interpret),)


_d2s.defvjp(_d2s_fwd, _d2s_bwd)


def depth_to_space2(
    x: jnp.ndarray,
    oheight: int,
    owidth: int,
    *,
    backend: str = "jnp",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """[N, H, W, 4*C] (channel = (px*2+py)*C + c) -> [N, oheight, owidth, C].

    backend='jnp' (the default and the production path -- see the module
    docstring for why the Pallas kernel measured slower in-model) or
    'pallas' (single-pass kernel with exact-adjoint backward; falls back to
    jnp on CPU, tiny channel counts, or shapes failing the VMEM guard).
    """
    n, h, w, c4 = x.shape
    if c4 % 4:
        raise ValueError(f"channel dim {c4} not a multiple of 4")
    if not (0 < oheight <= 2 * h and 0 < owidth <= 2 * w):
        raise ValueError(f"crop ({oheight},{owidth}) outside 2x of {(h, w)}")
    if backend == "pallas":
        if interpret is None:
            interpret = _interpret_default()
        c = c4 // 4
        if not interpret and c % 8 == 0 and fits_vmem(x.shape, x.dtype.itemsize):
            return _d2s(x, oheight, owidth, False)
    elif backend != "jnp":
        raise ValueError(f"unknown backend {backend!r}")
    return depth_to_space2_jnp(x, oheight, owidth)
