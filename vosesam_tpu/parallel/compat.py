"""JAX API compatibility shims.

shard_map moved from jax.experimental.shard_map (kw `check_rep`) to
jax.shard_map (kw `check_vma`) in JAX 0.8. Expose one callable accepting
either spelling so call sites don't fork on version.
"""

try:
    from jax import shard_map as _shard_map_new

    def shard_map(f, **kwargs):
        if "check_rep" in kwargs:
            kwargs["check_vma"] = kwargs.pop("check_rep")
        return _shard_map_new(f, **kwargs)

except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map  # type: ignore

__all__ = ["shard_map"]
