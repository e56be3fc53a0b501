"""teochat-tpu: a TPU-native (JAX/XLA/Pallas/pjit) vision-language framework for
temporal earth-observation imagery, with the capabilities of ermongroup/TEOChat.

Public API mirrors the reference's documented surface (README.md:113-124 of the
reference): `load_model`, `run_inference_single`, `conv_templates`,
`tokenizer_image_token`, plus the TPU-native model/ops/parallel layers underneath.
"""

__version__ = "0.1.0"

from teochat_tpu.constants import (
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
    DEFAULT_IMAGE_TOKEN,
    DEFAULT_VIDEO_TOKEN,
    MAX_IMAGE_LENGTH,
    MAX_VIDEO_LENGTH,
)
from teochat_tpu.conversation import Conversation, SeparatorStyle, conv_templates
from teochat_tpu.mm_utils import (
    tokenizer_image_token,
    get_model_name_from_path,
    KeywordsStoppingCriteria,
)

__all__ = [
    "IGNORE_INDEX",
    "IMAGE_TOKEN_INDEX",
    "DEFAULT_IMAGE_TOKEN",
    "DEFAULT_VIDEO_TOKEN",
    "MAX_IMAGE_LENGTH",
    "MAX_VIDEO_LENGTH",
    "Conversation",
    "SeparatorStyle",
    "conv_templates",
    "tokenizer_image_token",
    "get_model_name_from_path",
    "KeywordsStoppingCriteria",
]
