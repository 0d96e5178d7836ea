from .artifacts import (
    append_loss_row,
    draw_gan_loss,
    load_gan_loss_csv,
    save_gan_loss_csv,
)
from .checkpoint import load_gan_state, save_gan_state, load_params, save_params

__all__ = [
    "append_loss_row",
    "draw_gan_loss",
    "load_gan_loss_csv",
    "load_gan_state",
    "load_params",
    "save_gan_loss_csv",
    "save_gan_state",
    "save_params",
]
