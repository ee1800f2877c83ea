from lanczos_tpu.methods.vector_lanczos import vector_lanczos, VectorLanczosResult
from lanczos_tpu.methods.block_lanczos import block_lanczos, BlockLanczosResult
from lanczos_tpu.methods.fdtd import fdtd_vector, fdtd_block
from lanczos_tpu.methods.expm_action import (
    lanczos_expm_action,
    block_lanczos_expm_action,
)
from lanczos_tpu.methods.eigs import lanczos_eigsh, block_lanczos_eigsh
from lanczos_tpu.methods.checkpoint import (
    vector_lanczos_checkpointed,
    block_lanczos_checkpointed,
    fdtd_checkpointed,
)

__all__ = [
    "vector_lanczos_checkpointed",
    "block_lanczos_checkpointed",
    "fdtd_checkpointed",
    "vector_lanczos",
    "VectorLanczosResult",
    "block_lanczos",
    "BlockLanczosResult",
    "fdtd_vector",
    "fdtd_block",
    "lanczos_expm_action",
    "block_lanczos_expm_action",
    "lanczos_eigsh",
    "block_lanczos_eigsh",
]
