from . import distributions, indexing, math, stn, targets
from .math import clip_preserve, ess, maybe_concat
from .distributions import (
    Bernoulli,
    Categorical,
    Geometric,
    MultivariateNormalTriL,
    Normal,
    NumStepsDistribution,
    fill_triangular,
)
from .indexing import (
    compute_object_ids,
    gather_axis,
    sample_from_tensor,
    select_present,
    tile_input_for_iwae,
)
from .stn import (
    extract_glimpse,
    paste_glimpse,
    pixel_to_stn_coords,
    stn_to_pixel_coords,
    to_coords,
    to_logits,
)
from .targets import iwae, l2_reg, reinforce, vimco, vimco_control_variate
