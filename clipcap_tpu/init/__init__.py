from clipcap_tpu.init.base import init

__all__ = ["init"]
