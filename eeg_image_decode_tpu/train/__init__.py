from eeg_image_decode_tpu.train.evaluator import (  # noqa: F401
    kway_accuracy,
    retrieval_eval,
)
from eeg_image_decode_tpu.train.contrastive import (  # noqa: F401
    ContrastiveTrainer,
    TrainState,
    create_train_state,
    make_epoch_fn,
    make_eval_features_fn,
)
