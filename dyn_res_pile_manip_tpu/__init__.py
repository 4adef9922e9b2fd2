"""dyn_res_pile_manip_tpu: a TPU-native (JAX/XLA/Pallas) framework for
dynamic-resolution object-pile manipulation.

A ground-up rebuild of the capabilities of the reference stack
``WangYixuan12/dyn-res-pile-manip`` (RSS 2023, "Dynamic-Resolution Model
Learning for Object Pile Manipulation"):

- ``sim``:     position-based-dynamics granular simulator (replaces NVIDIA
               FleX + PyFleX bindings) under ``jit``/``scan`` with Pallas
               kernels on the hot path.
- ``render``:  fused depth/RGB point-splat rasterizer (replaces the headless
               OpenGL renderer, PyFleX/bindings/opengl/).
- ``env``:     gym-style pile-pushing environment (replaces env/flex_env.py).
- ``models``:  PropNet-style GNN dynamics + resolution-regressor CNN in flax
               (replaces model/gnn_dyn.py, model/res_regressor.py).
- ``planner``: gradient-descent / MPPI MPC over vmapped GNN rollouts
               (replaces planners.py).
- ``parallel``: device-mesh sharding for MPC samples + data-parallel training.
- ``train`` / ``datagen`` / ``datasets``: workload entry points mirroring the
  five CLI commands of the reference README.
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent XLA compile cache: whole-push scans are large programs and
    recompile per frame-count bucket; caching makes reset/push compiles a
    once-per-machine cost. Opt out with DYNRES_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("DYNRES_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if not os.environ.get("PALLAS_AXON_POOL_IPS"):
            # without the axon plugin, XLA:CPU AOT deserialization on this
            # host SEGFAULTS (even on same-process entries) — plain-CPU
            # runs must go cold
            return
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.expanduser("~/.cache/dynres_jax_cache"))
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
    except Exception:
        pass


_enable_compilation_cache()
