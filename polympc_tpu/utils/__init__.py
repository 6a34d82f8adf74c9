from polympc_tpu.utils import status
from polympc_tpu.utils.status import status_name

__all__ = ["status", "status_name"]
