from .layers import (
    GRU,
    LSTM,
    MLP,
    RNN_CELLS,
    ConvNet,
    Decoder,
    Encoder,
    UpConvNet,
    VanillaRNN,
    const_init,
    make_cell,
    state_feature,
)
from .stochastic import (
    AffineDiagNormal,
    ConditionedNormalAdaptor,
    GaussianFromParamVec,
    RecurrentNormal,
    RecurrentNormalImpl,
    StepsPredictor,
    StochasticTransformParam,
)
