from .image import make_stylize_fn, init_inference_params, stylize_image

__all__ = ["make_stylize_fn", "init_inference_params", "stylize_image"]
