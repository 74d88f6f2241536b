'''Weight-init registry.

Reference: `nnutils/initialize.py:7` — an `init` class whose `N01/N002/xavier/
kaiming` appliers mutate torch modules. Flax modules take initializers at
construction, so the TPU-native shape is (a) a name -> flax initializer lookup
used by model definitions, and (b) `apply_init(params, ...)` which re-draws an
existing params pytree with a chosen scheme (used by recipes that call
`.apply(init_weight_N01)` after construction, e.g. StyleGAN2 utils.py:196).
'''

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


_REGISTRY = {
    'N01':     nn.initializers.normal(stddev=1.0),
    'N002':    nn.initializers.normal(stddev=0.02),
    'ortho':   nn.initializers.orthogonal(),
    'xavier':  nn.initializers.xavier_normal(),
    'kaiming': nn.initializers.kaiming_normal(),
    'zeros':   nn.initializers.zeros_init(),
    'ones':    nn.initializers.ones_init(),
}


def get_initializer(name: str):
    if name not in _REGISTRY:
        raise KeyError(f'unknown initializer {name!r}; have {sorted(_REGISTRY)}')
    return _REGISTRY[name]


def _is_kernel(path) -> bool:
    last = str(path[-1].key) if hasattr(path[-1], 'key') else str(path[-1])
    return last in ('kernel', 'weight')


def _is_bias(path) -> bool:
    last = str(path[-1].key) if hasattr(path[-1], 'key') else str(path[-1])
    return last == 'bias'


def _is_norm_scale(path) -> bool:
    last = str(path[-1].key) if hasattr(path[-1], 'key') else str(path[-1])
    return last == 'scale'


def apply_init(key, params, name: str = 'N002', names: tuple = ()):
    '''Redraw kernels of a params pytree with the named scheme.

    Kernels (path leaf `kernel`/`weight`, ndim >= 2) get the scheme; biases get
    zeros; norm scales get ones; anything else is left untouched. `names` adds
    extra leaf names to treat as kernels (reference `init(my_classes, names)`).
    '''
    initializer = get_initializer(name)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(key, len(flat))
    new_leaves = []
    for k, (path, leaf) in zip(keys, flat):
        last = str(path[-1].key) if hasattr(path[-1], 'key') else str(path[-1])
        if (_is_kernel(path) or last in names) and jnp.ndim(leaf) >= 2:
            new_leaves.append(initializer(k, leaf.shape, leaf.dtype))
        elif _is_bias(path):
            new_leaves.append(jnp.zeros_like(leaf))
        elif _is_norm_scale(path):
            new_leaves.append(jnp.ones_like(leaf))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


class init:
    '''Reference-shaped facade: `init().N01` etc. return (key, params) -> params.'''

    def __init__(self, my_classes=None, names=None) -> None:
        self.names = tuple(names) if names else ()

    def _make(self, scheme):
        def apply(key, params):
            return apply_init(key, params, scheme, self.names)
        return apply

    @property
    def N01(self):
        return self._make('N01')

    @property
    def N002(self):
        return self._make('N002')

    @property
    def xavier(self):
        return self._make('xavier')

    @property
    def kaiming(self):
        return self._make('kaiming')
