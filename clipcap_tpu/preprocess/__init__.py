from clipcap_tpu.preprocess.preprocess import preprocess, start_preprocess

__all__ = ["preprocess", "start_preprocess"]
