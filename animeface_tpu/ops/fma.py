'''fma — fused multiply-add a*b + c.

Reference `thirdparty/stylegan3_ops/ops/fma.py:9` wrapped torch.addcmul in a
custom autograd.Function with broadcasting-aware backward. XLA fuses `a*b + c`
into a single op and `jax.grad` handles broadcasting, so this is a plain
expression kept for API parity.
'''


def fma(a, b, c):
    return a * b + c
