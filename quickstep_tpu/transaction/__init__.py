from quickstep_tpu.transaction.lock_manager import (  # noqa: F401
    AccessMode, LockManager, LockTable, TransactionTable, DeadLockDetector,
    ResourceId, TransactionStatus,
)
