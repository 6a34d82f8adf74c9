from polympc_tpu.ocp.ocp import OCP
from polympc_tpu.ocp.transcription import (
    Transcription, transcribe, ocp_bounds, split_z, pack_z,
)

__all__ = ["OCP", "Transcription", "transcribe", "ocp_bounds",
           "split_z", "pack_z"]
