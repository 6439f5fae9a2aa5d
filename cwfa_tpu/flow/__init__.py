"""Invertible-flow runtime: pure-function invertible ops with exact log-dets.

Replaces the reference's vendored FrEIA graph interpreter
(reference: FrEIA/framework/graph_inn.py) with statically composed pure
functions — the CWF step graph is fixed, so there is nothing to interpret at
runtime and the whole chain compiles into one XLA program.
"""

from cwfa_tpu.flow.haar import (  # noqa: F401
    haar1d, haar2d_downsample, haar2d_upsample,
)
from cwfa_tpu.flow.permute import (  # noqa: F401
    make_channel_perm, make_spatial_perm, apply_channel_perm,
    apply_spatial_perm, ReferencePermReplayer,
)
from cwfa_tpu.flow.coupling import (  # noqa: F401
    clamp_fn, cat_transform, two_sided_coupling, one_sided_coupling,
    all_in_one_block, init_all_in_one_block,
)
from cwfa_tpu.flow.actnorm import init_actnorm, actnorm, actnorm_data_init  # noqa: F401
from cwfa_tpu.flow.subnets import (  # noqa: F401
    init_wavelet_flow_subnet2d, wavelet_flow_subnet2d,
    init_wavelet_flow_subnet2d_first, wavelet_flow_subnet2d_first,
    init_subnet_conv, subnet_conv,
)
from cwfa_tpu.flow.core import numerical_logdet, check_inverse  # noqa: F401
