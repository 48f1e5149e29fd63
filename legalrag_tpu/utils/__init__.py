from legalrag_tpu.utils.lang import detect_lang, has_chinese
from legalrag_tpu.utils.logger import get_logger

__all__ = ["detect_lang", "has_chinese", "get_logger"]
