from climategan_tpu.models.blocks import (  # noqa: F401
    BaseDecoder,
    Conv2dBlock,
    ResBlock,
    ResBlocks,
    SPADEResnetBlock,
)
from climategan_tpu.models.generator import (  # noqa: F401
    GenConfig,
    OmniGenerator,
    create_generator,
)
from climategan_tpu.models.norms import SNConv, SPADE  # noqa: F401
from climategan_tpu.models.resnet import ResNetEncoder  # noqa: F401
