from cspn_tpu.utils.images import save_eval_images
from cspn_tpu.utils.precision import cast_floating

__all__ = ["save_eval_images", "cast_floating"]
