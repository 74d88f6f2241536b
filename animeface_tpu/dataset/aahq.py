'''AAHQ dataset family (reference `dataset/aahq.py`).'''

from __future__ import annotations

import glob
import random
from collections.abc import Callable
from typing import Optional

from animeface_tpu.dataset._base import (
    Image, ImageImage, LRHR, make_default_transform, data_path,
)


def _aahq_images() -> list[str]:
    return sorted(glob.glob(data_path('aahq', '*')))


class AAHQ(Image):
    def __init__(self, image_size: int, num_images: Optional[int] = None,
                 transform: Optional[Callable] = None) -> None:
        self.num_images = num_images
        if transform is None:
            transform = make_default_transform(image_size)
        super().__init__(transform)

    def _load(self):
        images = _aahq_images()
        if self.num_images is not None and 0 < self.num_images < len(images):
            random.shuffle(images)
            images = images[:self.num_images]
        return images


class AAHQSR(LRHR):
    def __init__(self, image_size: int, scale: float = 2, resize_scale: float = 1.,
                 num_images: Optional[int] = None,
                 transform: Optional[Callable] = None) -> None:
        self.num_images = num_images
        super().__init__(image_size, scale, resize_scale)
        if callable(transform):
            self.transform = transform

    def _load(self) -> list[str]:
        paths = _aahq_images()
        if self.num_images is not None and 0 < self.num_images < len(paths):
            random.shuffle(paths)
            paths = paths[:self.num_images]
        return paths


class AAHQCelebA(ImageImage):
    def __init__(self, image_size: int, num_images: Optional[int] = None,
                 transform: Optional[Callable] = None) -> None:
        self.num_images = num_images
        if transform is None:
            transform = make_default_transform(image_size)
        super().__init__(transform)

    def _load(self):
        images = _aahq_images()
        celeba = sorted(glob.glob(data_path('celeba', 'img_align_celeba', '*')))
        length = min(len(images), len(celeba))
        images, celeba = images[:length], celeba[:length]
        if self.num_images is not None and 0 < self.num_images < length:
            random.shuffle(images)
            random.shuffle(celeba)
            images, celeba = images[:self.num_images], celeba[:self.num_images]
        return images, celeba
