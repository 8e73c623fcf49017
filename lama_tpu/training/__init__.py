from .state import TrainState, create_train_state, make_optimizer
from .step import InpaintingTrainStep
