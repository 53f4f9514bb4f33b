from mulactseg_tpu.active.active_set import RegionActiveSet

__all__ = ["RegionActiveSet"]
