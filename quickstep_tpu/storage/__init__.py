from quickstep_tpu.storage.dictionary import Dictionary  # noqa: F401
from quickstep_tpu.storage.column import Column  # noqa: F401
from quickstep_tpu.storage.table import TableData  # noqa: F401
