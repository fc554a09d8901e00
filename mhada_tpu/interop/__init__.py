from .pth_reader import load_pth
from .torch_import import (
    import_vit,
    import_adaformer,
    import_adaattn_transformer,
    import_vgg19,
    import_decoder,
)

__all__ = [
    "load_pth",
    "import_vit",
    "import_adaformer",
    "import_adaattn_transformer",
    "import_vgg19",
    "import_decoder",
]
