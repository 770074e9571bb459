"""SAM (Segment Anything) in flax: ViT encoder with windowed attention,
prompt encoder, two-way-transformer mask decoder, and the automatic mask
generation (AMG) machinery."""

from sam6d_tpu.models.ism.sam.encoder import ImageEncoderViT  # noqa: F401
from sam6d_tpu.models.ism.sam.prompt import PromptEncoder  # noqa: F401
from sam6d_tpu.models.ism.sam.decoder import MaskDecoder  # noqa: F401
