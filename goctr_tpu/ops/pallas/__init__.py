from goctr_tpu.ops.pallas.din_attention import din_attention_pool
from goctr_tpu.ops.pallas.embedding_lookup import fused_gather_pool
