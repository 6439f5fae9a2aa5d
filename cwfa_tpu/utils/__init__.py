"""Host-side utilities: projections/visualization, seeding."""

from cwfa_tpu.utils.projections import (  # noqa: F401
    volume_2_projections, composite_projection, create_image_pyramid,
)
from cwfa_tpu.utils.seeding import set_all_seeds  # noqa: F401
