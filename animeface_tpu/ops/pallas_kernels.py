'''Pallas TPU kernels for the hot ops.

Populated incrementally; `None` entries make the registry fall back to the
'xla' formulation (mirroring the reference's plugin-build fallback,
`upfirdn2d.py:156-158`). The 'xla' twins in upfirdn2d.py / bias_act.py /
filtered_lrelu.py are the numerical oracles for these kernels.
'''

from __future__ import annotations

upfirdn2d_pallas = None
bias_act_pallas = None
filtered_lrelu_pallas = None
