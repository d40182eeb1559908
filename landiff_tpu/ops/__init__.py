# NOTE: the dispatcher `attention.attention` is NOT re-exported at package
# level — it would shadow the `ops.attention` submodule attribute.
from landiff_tpu.ops.attention import flash_attention, \
    mha_reference  # noqa: F401
from landiff_tpu.ops.embeddings import timestep_embedding  # noqa: F401
from landiff_tpu.ops.norms import group_norm, layer_norm, modulate, \
    rms_norm  # noqa: F401
from landiff_tpu.ops.rope import apply_rope, rope_1d_table, \
    rope_3d_by_index  # noqa: F401
