from .pth_reader import load_pth
from .torch_import import (
    import_vit,
    import_vit_multiscale,
    import_adaformer,
    import_adaattn_transformer,
    import_vgg19,
    import_decoder,
)
from .torch_export import (
    export_vit,
    export_adaformer,
    export_decoder,
    save_pth,
)

__all__ = [
    "load_pth",
    "import_vit",
    "import_adaformer",
    "import_adaattn_transformer",
    "import_vgg19",
    "import_decoder",
    "import_vit_multiscale",
    "export_vit",
    "export_adaformer",
    "export_decoder",
    "save_pth",
]
