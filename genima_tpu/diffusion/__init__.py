from genima_tpu.diffusion.schedulers import (  # noqa: F401
    DDIMScheduler,
    DDPMScheduler,
    EulerAncestralScheduler,
    EulerDiscreteScheduler,
    SchedulerConfig,
)
