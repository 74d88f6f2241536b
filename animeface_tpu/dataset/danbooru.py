'''Danbooru 2020 dataset family (reference `dataset/danbooru.py`).'''

from __future__ import annotations

import glob
import random
from collections.abc import Callable
from typing import Optional

from PIL import Image as pilImage

from animeface_tpu.dataset._base import (
    Image, LRHR, make_default_transform, data_path,
)


def _danbooru_images() -> list[str]:
    return sorted(glob.glob(data_path('danbooru', '2020', '*', '*.jpg')))


class Danbooru(Image):
    def __init__(self, image_size: int, num_images: Optional[int] = None,
                 transform: Optional[Callable] = None) -> None:
        self.num_images = num_images
        if transform is None:
            transform = make_default_transform(image_size, 1.2)
        super().__init__(transform)

    def _load(self) -> list[str]:
        images = _danbooru_images()
        if self.num_images is not None:
            random.shuffle(images)
            images = images[:self.num_images]
        return images


class DanbooruSR(LRHR):
    def __init__(self, image_size: int, scale: float = 2,
                 resize_ratio: float = 1.1, num_images: Optional[int] = None,
                 transform: Optional[Callable] = None) -> None:
        self.num_images = num_images
        super().__init__(image_size, scale, resize_ratio)
        if callable(transform):
            self.transform = transform

    def _load(self) -> list[str]:
        paths = _danbooru_images()
        if self.num_images is not None:
            random.shuffle(paths)
            paths = paths[:self.num_images]
        return paths


class DanbooruAutoPair(Danbooru):
    '''On-the-fly pairs: (transform(img), transform(pair_transform(img))).'''

    def __init__(self, image_size: int, pair_transform: Callable,
                 num_images: Optional[int] = None,
                 transform: Optional[Callable] = None) -> None:
        super().__init__(image_size, num_images, transform)
        self.pair_transform = pair_transform

    def __getitem__(self, index):
        pil = pilImage.open(self.images[index]).convert('RGB')
        return self._transform(pil)

    def _transform(self, pil_image):
        pair_image = self.transform(self.pair_transform(pil_image))
        image = self.transform(pil_image)
        return image, pair_image
