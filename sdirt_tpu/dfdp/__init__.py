from .basenet import Basenet, compute_loss, linear_depth  # noqa: F401
from .monitor import ResultsMonitor, select_focus_dist  # noqa: F401
from .train import create_dfdp_state, dfdp_infer, dfdp_train_step  # noqa: F401
