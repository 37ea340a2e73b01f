from hybridsearch_tpu.training.contrastive import (  # noqa: F401
    ContrastiveTrainer,
    info_nce_loss,
    make_train_step,
)
