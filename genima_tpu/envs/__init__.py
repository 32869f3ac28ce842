from genima_tpu.envs.wrappers import (  # noqa: F401
    ActionSequence,
    AppendDemoInfo,
    FrameStack,
    JointNormalization,
    NormProprioFromStats,
    OnehotTime,
    TimeLimit,
    wrap_env,
)
from genima_tpu.envs.fake import FakeRLBenchEnv, FakeRLBenchFactory  # noqa: F401
from genima_tpu.envs.demo import (  # noqa: F401
    DemoStep,
    compute_action_stats,
    compute_proprio_stats,
    demo_to_episode,
)
from genima_tpu.envs.export import export_demos_rlbench_format  # noqa: F401
from genima_tpu.envs.rendered import RenderedDemoFactory  # noqa: F401
