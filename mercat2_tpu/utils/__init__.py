from mercat2_tpu.utils.runtime import (
    DebugTrace,
    StageTimer,
    enable_compilation_cache,
    mem_use,
)

__all__ = ["enable_compilation_cache", "StageTimer", "DebugTrace", "mem_use"]
