from .gan import (
    GANConfig,
    GANState,
    create_gan_modules,
    init_gan_state,
    make_gan_epoch_step,
    make_gan_train_step,
    LOGGED_LOSS_KEYS,
)
from .classifier import (
    ClassifierState,
    make_classifier_epoch_steps,
    make_classifier_steps,
    init_classifier_state,
)
from .loop import run_epoch, run_epoch_fused, EpochResult
from .optim import torch_adam

__all__ = [
    "ClassifierState",
    "EpochResult",
    "GANConfig",
    "GANState",
    "LOGGED_LOSS_KEYS",
    "create_gan_modules",
    "init_classifier_state",
    "init_gan_state",
    "make_classifier_epoch_steps",
    "make_classifier_steps",
    "make_gan_epoch_step",
    "make_gan_train_step",
    "run_epoch",
    "run_epoch_fused",
    "torch_adam",
]
