"""supersampler_tpu — TPU-native Fractional Hitting Set k-mer sketching.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
TimRouze/supersampler with bit-identical outputs.
"""

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache so fresh CLI processes
    skip the per-shape XLA compile (~seconds to minutes on a tunneled
    device). Safe to call more than once."""
    import jax

    cache_dir = path or os.environ.get(
        "SPSP_XLA_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "supersampler_tpu", "xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
