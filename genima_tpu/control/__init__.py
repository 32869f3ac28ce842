from genima_tpu.control.policy import GenimaACTAgent  # noqa: F401
from genima_tpu.control.replay import EpochReplayBuffer  # noqa: F401
