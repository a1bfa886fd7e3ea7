from .flash_attention import attention_reference, flash_attention
from .geglu import geglu, geglu_reference
from .groupnorm import group_norm_silu, group_norm_silu_reference
