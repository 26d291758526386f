
import os as _os

# persistent XLA compilation cache: the decoder compiles a handful of
# (resolution, sparse-tier, intra-tier) step variants; caching makes them
# one-time across processes. Override/disable via JAX_COMPILATION_CACHE_DIR.
def _init_compile_cache():
    path = _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/tmp/h264bsd_tpu_jaxcache")
    if not path:
        return
    try:
        from jax._src import compilation_cache as _cc
        _cc.set_cache_dir(path)
    except Exception:
        pass


_init_compile_cache()
