from .loader import (
    AXES,
    Minibatcher,
    curriculum_seq_len,
    load_pickle,
    process_data,
    save_pickle,
    tile_nums_over_time,
    truncate_batch,
)
from .moving_mnist import (
    OnDeviceDatasetSampler,
    OnDeviceSeqMNIST,
    create_seq_dataset,
    create_static,
)
from .synthetic import make_template_bank, template_dimensions
from .trajectory import NoisyAccelerationTrajectory, jax_noisy_acceleration
