from mercat2_tpu.orf.caller import orf_call

__all__ = ["orf_call"]
