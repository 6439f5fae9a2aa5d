"""Model definitions: CWF steps, condition networks, LRNN/U-Net, XLFMNet."""

from cwfa_tpu.models.cond_net import init_cond_network, cond_network  # noqa: F401
from cwfa_tpu.models.unet import init_unet, unet  # noqa: F401
from cwfa_tpu.models.lrnn import init_lrnn, lrnn, init_encoder, encoder  # noqa: F401
from cwfa_tpu.models.cwf import (  # noqa: F401
    CWFStepSpec, build_step_specs, init_cwf_step,
    cwf_step_forward, cwf_step_reverse,
)
from cwfa_tpu.models.cwfa_model import CWFAModel  # noqa: F401
from cwfa_tpu.models.xlfmnet import init_xlfmnet, xlfmnet  # noqa: F401
