from climategan_tpu.events.fire import add_fire  # noqa: F401
from climategan_tpu.events.smog import add_smog  # noqa: F401
