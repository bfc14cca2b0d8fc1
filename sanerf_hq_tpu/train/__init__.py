from .state import (
    TrainState,
    create_train_state,
    make_optimizer,
    exp_decay_schedule,
    freeze_mask_from_loaded,
)
from .steps import (
    make_rgb_train_step,
    make_sam_distill_step,
    make_mask_train_step,
    make_eval_render,
    ray_pair_rgb_loss,
    label_regularization,
)
from .trainer import Trainer
from .checkpoints import CheckpointManager, partial_load
from .metrics import (
    PSNRMeter,
    SSIMMeter,
    LPIPSMeter,
    MeanIoUMeter,
    MSEMeter,
    psnr,
    ssim,
    pixel_accuracy,
)
from . import stages
