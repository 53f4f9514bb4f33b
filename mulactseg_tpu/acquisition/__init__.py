from mulactseg_tpu.acquisition.selectors import get_selector, SELECTORS

__all__ = ["get_selector", "SELECTORS"]
