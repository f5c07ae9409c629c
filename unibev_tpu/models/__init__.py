from unibev_tpu.models import layers  # noqa: F401
from unibev_tpu.models.attention import deformable  # noqa: F401
from unibev_tpu.models.backbones import resnet, second  # noqa: F401
from unibev_tpu.models.necks import fpn  # noqa: F401
from unibev_tpu.models import middle_encoder, encoders, decoder  # noqa: F401
from unibev_tpu.models import transformer_fusion  # noqa: F401
from unibev_tpu.models.heads import unibev_head  # noqa: F401
from unibev_tpu.models.detectors import unibev  # noqa: F401
from unibev_tpu.models import radar  # noqa: F401
