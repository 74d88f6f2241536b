'''Data layer (reference `dataset/` parity + TPU-native loading).

`build_dataset(args, task)` is the central factory the training recipes use:
it maps the `--dataset` CLI name to the concrete class per task (mirroring the
per-recipe if/elif blocks in the reference, e.g. StyleGAN2/utils.py) and falls
back to the procedural synthetic datasets when `--synthetic-data` is set or
the data root is missing — so every recipe runs on any machine.
'''

from __future__ import annotations

import os
import warnings
from collections.abc import Iterable

from animeface_tpu.dataset._base import (
    WrappedDataset, DataLoader, make_default_transform, set_data_root,
    data_path, Image, ImageImage, ImageXDoG, ImageGray, ImageLabel,
    ImageOnehot, LRHR,
)
from animeface_tpu.dataset.animeface import (
    AnimeFace, AnimeFaceCelebA, AnimeFaceSR, AnimeFaceXDoG, AnimeFaceGray,
    AnimeFaceLabel, AnimeFaceOneHot,
)
from animeface_tpu.dataset.portrait import (
    DanbooruPortrait, DanbooruPortraitCelebA, DanbooruPortraitSR,
    DanbooruPortraitXDoG, DanbooruPortraitGray,
)
from animeface_tpu.dataset.danbooru import Danbooru, DanbooruSR, DanbooruAutoPair
from animeface_tpu.dataset.aahq import AAHQ, AAHQSR, AAHQCelebA
from animeface_tpu.dataset.synthetic import (
    SyntheticImage, SyntheticImageImage, SyntheticLRHR, SyntheticImageXDoG,
    SyntheticImageGray, SyntheticImageLabel, SyntheticImageOnehot,
)


def cycle(iterable: Iterable):
    '''Endless epoch cycling (reference dataset/__init__.py:34).'''
    while True:
        for i in iterable:
            yield i


def to_loader(dataset, batch_size: int, shuffle: bool = True,
              num_workers: int | None = None, pin_memory: bool = False,
              **kwargs) -> DataLoader:
    '''Reference to_loader (dataset/__init__.py:39); pin_memory is a no-op.'''
    return DataLoader(dataset, batch_size, shuffle=shuffle,
                      num_workers=num_workers, **kwargs)


# --- factory -----------------------------------------------------------------

_REGISTRY = {
    # task -> dataset-name -> (cls, kwargs builder)
    'image': {
        'animeface': lambda a: (AnimeFace, dict(image_size=a.image_size,
                                                min_year=a.min_year)),
        'danbooru': lambda a: (DanbooruPortrait, dict(image_size=a.image_size,
                                                      num_images=a.num_images)),
        'danbooru2020': lambda a: (Danbooru, dict(image_size=a.image_size,
                                                  num_images=a.num_images)),
        'aahq': lambda a: (AAHQ, dict(image_size=a.image_size,
                                      num_images=a.num_images)),
    },
    'celeba': {
        'animeface': lambda a: (AnimeFaceCelebA, dict(image_size=a.image_size,
                                                      min_year=a.min_year)),
        'danbooru': lambda a: (DanbooruPortraitCelebA,
                               dict(image_size=a.image_size,
                                    num_images=a.num_images)),
        'aahq': lambda a: (AAHQCelebA, dict(image_size=a.image_size,
                                            num_images=a.num_images)),
    },
    'sr': {
        'animeface': lambda a: (AnimeFaceSR, dict(image_size=a.image_size,
                                                  scale=getattr(a, 'scale', 2))),
        'danbooru': lambda a: (DanbooruPortraitSR,
                               dict(image_size=a.image_size,
                                    scale=getattr(a, 'scale', 2),
                                    num_images=a.num_images)),
        'danbooru2020': lambda a: (DanbooruSR,
                                   dict(image_size=a.image_size,
                                        scale=getattr(a, 'scale', 2),
                                        num_images=a.num_images)),
    },
    'xdog': {
        'animeface': lambda a: (AnimeFaceXDoG, dict(image_size=a.image_size,
                                                    min_year=a.min_year)),
        'danbooru': lambda a: (DanbooruPortraitXDoG,
                               dict(image_size=a.image_size,
                                    num_images=a.num_images)),
    },
    'gray': {
        'animeface': lambda a: (AnimeFaceGray, dict(image_size=a.image_size)),
        'danbooru': lambda a: (DanbooruPortraitGray,
                               dict(image_size=a.image_size,
                                    num_images=a.num_images)),
    },
    'label': {
        'animeface': lambda a: (AnimeFaceLabel, dict(image_size=a.image_size)),
    },
    'onehot': {
        'animeface': lambda a: (AnimeFaceOneHot, dict(image_size=a.image_size)),
    },
}

_SYNTHETIC = {
    'image': lambda a: SyntheticImage(a.image_size, _syn_count(a), a.seed),
    'celeba': lambda a: SyntheticImageImage(a.image_size, _syn_count(a), a.seed),
    'sr': lambda a: SyntheticLRHR(a.image_size, getattr(a, 'scale', 2),
                                  _syn_count(a), a.seed),
    'xdog': lambda a: SyntheticImageXDoG(a.image_size, _syn_count(a), a.seed),
    'gray': lambda a: SyntheticImageGray(a.image_size, _syn_count(a), a.seed),
    'label': lambda a: SyntheticImageLabel(a.image_size, _syn_count(a), seed=a.seed),
    'onehot': lambda a: SyntheticImageOnehot(a.image_size, _syn_count(a), seed=a.seed),
}


def _syn_count(args) -> int:
    n = getattr(args, 'num_images', None) or 2048
    return min(int(n), 10_000)


def build_dataset(args, task: str = 'image'):
    '''Dataset instance for `--dataset <name>` under the given task shape.

    Falls back to the synthetic stand-in when `--synthetic-data` is set, or
    when the data root does not exist (with a warning).
    '''
    if getattr(args, 'data_root', None):
        set_data_root(args.data_root)
    use_synthetic = getattr(args, 'synthetic_data', False)
    if not use_synthetic and not os.path.isdir(
            getattr(args, 'data_root', None) or data_path()):
        warnings.warn(f'data root not found; using synthetic {task} data')
        use_synthetic = True
    if use_synthetic:
        return _SYNTHETIC[task](args)

    task_map = _REGISTRY[task]
    name = args.dataset
    if name not in task_map:
        raise KeyError(f'dataset {name!r} unsupported for task {task!r}; '
                       f'have {sorted(task_map)}')
    cls, kwargs = task_map[name](args)
    return cls(**kwargs)


def build_loader(args, task: str = 'image', batch_size: int | None = None,
                 **loader_kwargs) -> DataLoader:
    dataset = build_dataset(args, task)
    if getattr(args, 'device_data', False):
        import jax.numpy as jnp
        from animeface_tpu.dataset.device import DeviceDataLoader
        loader_kwargs.pop('num_workers', None)
        loader_kwargs.pop('prefetch', None)
        # bf16 training decodes to bf16 on device (models cast inputs to the
        # compute dtype anyway; the stored data is uint8-quantized)
        loader_kwargs.setdefault(
            'decode_dtype',
            jnp.float32 if getattr(args, 'no_bf16', False) else jnp.bfloat16)
        return DeviceDataLoader(dataset, batch_size or args.batch_size,
                                seed=getattr(args, 'seed', 0), **loader_kwargs)
    return DataLoader(dataset, batch_size or args.batch_size,
                      seed=getattr(args, 'seed', 0), **loader_kwargs)
