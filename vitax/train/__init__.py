from vitax.train.schedules import (  # noqa: F401
    onecycle_lr,
    onecycle_momentum,
    cosine_with_warmup_lr,
    cosine_annealing_lr,
)
from vitax.train.optim import sgd_momentum, adamw  # noqa: F401
from vitax.train.steps import (  # noqa: F401
    TrainState,
    create_train_state,
    cross_entropy,
    topk_accuracy,
    make_train_step,
    make_eval_step,
)
