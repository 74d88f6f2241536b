'''SEBigGAN — author-original BigGAN variant with squeeze-and-excitation
gating as the NonLocal block (reference `implementations/original/SEBigGAN/
model.py`, SENet :350, NonLocal dispatch :371). The G/D trunks are the
shared unconditional BigGAN/BigGAN-deep stacks (the reference duplicates
them verbatim); attention appears ONCE at the arch table's att resolution,
exactly like BigGAN. All reference knobs (deep, att/act/norm names, sn)
pass through.'''

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from animeface_tpu.implementations.BigGAN.model import (
    Generator as _BigGANGenerator,
    Discriminator as _BigGANDiscriminator,
    SqueezeExcitation,
)

__all__ = ['Generator', 'Discriminator', 'SqueezeExcitation']


def Generator(image_size: int = 128, z_dim: int = 120, deep: bool = False,
              channels: int = 64, use_sn: bool = True, att_name: str = 'se',
              act_name: str = 'relu', norm_name: str = 'bn',
              dtype: Any = jnp.float32):
    '''Reference Generator signature (original/SEBigGAN/model.py:433).'''
    return _BigGANGenerator(
        image_size=image_size, z_dim=z_dim, channels=channels, deep=deep,
        use_sn=use_sn, att_name=att_name, norm_name=norm_name,
        act_name=act_name, dtype=dtype)


def Discriminator(image_size: int = 128, deep: bool = False,
                  channels: int = 64, use_sn: bool = True,
                  att_name: str = 'se', act_name: str = 'relu',
                  dtype: Any = jnp.float32):
    '''Reference Discriminator signature (original/SEBigGAN/model.py:534).'''
    return _BigGANDiscriminator(
        image_size=image_size, channels=channels, deep=deep, use_sn=use_sn,
        att_name=att_name, act_name=act_name, dtype=dtype)
