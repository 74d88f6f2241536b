'''Cross-cutting utilities (reference `utils/` parity).'''

from animeface_tpu.utils.misc import (
    EasyDict, print_for_repr, gif_from_files, make_image_grid, save_image,
    to_pil_image,
)
from animeface_tpu.utils.status import Status
from animeface_tpu.utils.argument import (
    get_default_parser, add_args, save_args, result_dir,
)

_DEBUG = False


def debug_mode():
    '''Activate rich console + tracebacks (reference utils/__init__.py:14).'''
    global _DEBUG
    _DEBUG = True
    try:
        from rich import print as rprint  # noqa: F401
        from rich.traceback import install
        install(show_locals=False)
    except ImportError:
        pass


def is_debug() -> bool:
    return _DEBUG
