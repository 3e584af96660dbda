from .layers import (
    GRU,
    LSTM,
    MLP,
    RNN_CELLS,
    Decoder,
    Encoder,
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
