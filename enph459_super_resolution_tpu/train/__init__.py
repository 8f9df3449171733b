"""Training: losses, EMA, train state/steps, data pipeline, checkpointing."""

from .losses import (
    PIXEL_LOSSES,
    PerceptualLoss,
    charbonnier_loss,
    gradient_feature_fn,
    l1_loss,
    l2_loss,
    psnr,
    ragan_discriminator_loss,
    ragan_generator_loss,
)
from .state import (
    GANBalance,
    GANTrainState,
    TrainConfig,
    TrainState,
    ema_update,
    make_gan_train_step,
    make_optimizer,
    make_train_step,
)
from .vgg import VGG19Features, load_torch_vgg19, make_vgg_feature_fn

__all__ = [
    "PIXEL_LOSSES", "PerceptualLoss", "charbonnier_loss",
    "gradient_feature_fn", "l1_loss", "l2_loss", "psnr",
    "ragan_discriminator_loss", "ragan_generator_loss",
    "GANBalance", "GANTrainState", "TrainConfig", "TrainState", "ema_update",
    "make_gan_train_step", "make_optimizer", "make_train_step",
    "VGG19Features", "load_torch_vgg19", "make_vgg_feature_fn",
]
