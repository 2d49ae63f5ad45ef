from grouptraj.train.steps import (  # noqa: F401
    TrainState, init_train_state, make_d_step, make_g_step,
    make_check_accuracy_step, make_check_accuracy_sweep,
    summarize_check_accuracy,
)
from grouptraj.train.checkpoint import (  # noqa: F401
    new_checkpoint, save_checkpoint, load_checkpoint,
    state_from_checkpoint, checkpoint_from_state,
)
from grouptraj.train.loop import train  # noqa: F401
from grouptraj.train.multi import train_many  # noqa: F401
