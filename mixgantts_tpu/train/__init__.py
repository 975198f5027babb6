from .guards import check_finite_metrics, debug_nans
from .optim import build_fs2_optimizer, build_gan_optimizer, fs2_lr_schedule
from .state import TrainState, create_train_state
from .step import make_train_step, make_eval_step, chunk_train_step
