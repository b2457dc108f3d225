from cspn_tpu.utils.images import save_eval_images

__all__ = ["save_eval_images"]
