"""Data layer: XLFM datasets, lenslet view extraction, statistics, PSF/OTF."""

from cwfa_tpu.data.views import make_view_indices, extract_views  # noqa: F401
from cwfa_tpu.data.stats import (  # noqa: F401
    DatasetStatistics, fast_quantile, standardize,
)
from cwfa_tpu.data.tiff import read_tiff_stack, write_tiff_stack  # noqa: F401
from cwfa_tpu.data.psf import load_psf, load_psf_otf  # noqa: F401
from cwfa_tpu.data.dataset import XLFMDataset, ConcatXLFMDataset, load_xlfm_data  # noqa: F401
from cwfa_tpu.data.synthetic import make_synthetic_dataset  # noqa: F401
