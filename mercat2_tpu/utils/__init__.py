from mercat2_tpu.utils.runtime import enable_compilation_cache, StageTimer

__all__ = ["enable_compilation_cache", "StageTimer"]
