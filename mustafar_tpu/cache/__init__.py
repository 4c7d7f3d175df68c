from mustafar_tpu.cache.dense import DenseKVCache, MaskedKVCache  # noqa: F401


def make_cache(engine_cfg):
    """Cache-impl factory keyed on EngineConfig.cache_mode."""
    from mustafar_tpu.config import CacheMode

    if engine_cfg.cache_mode in (CacheMode.DENSE,):
        return DenseKVCache(engine_cfg)
    if engine_cfg.cache_mode == CacheMode.MASKED:
        return MaskedKVCache(engine_cfg)
    if engine_cfg.cache_mode == CacheMode.COMPRESSED:
        from mustafar_tpu.cache.compressed import CompressedKVCache

        return CompressedKVCache(engine_cfg)
    raise ValueError(engine_cfg.cache_mode)
