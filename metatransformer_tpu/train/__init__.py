from metatransformer_tpu.train import (  # noqa: F401
    augment,
    ema,
    losses,
    optim,
    schedules,
    step,
    trainer,
)
