"""Typed configuration system — one structured config replacing the
reference's per-script argparse duplication (SURVEY §5 "Config / flag
system"; axes from `examples/*/experiment.py:16-57`).

Dataclasses compose: ExperimentConfig = precision/backend + model sizes +
MCMC schedule (RunConfig, see experiments.runner) + sampler style + mesh.
`apply_backend()` applies the global JAX settings; `from_args()` builds a
config from CLI-style overrides so experiment scripts stay one-liners.
"""
import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

from .experiments.runner import RunConfig


@dataclass(frozen=True)
class BackendConfig:
    """Global JAX/XLA settings (reference flags: --precision, --gpu,
    --debug, --debug-nans)."""
    precision: str = "single"          # 'single' | 'double'
    platform: Optional[str] = None     # None = default; 'cpu' | 'tpu'
    debug: bool = False                # disable jit
    debug_nans: bool = False
    # TPU matmuls default to bf16 inputs, which degrades the XLA-path
    # filter algebra to ~1e-3 relative error (measured: the Pallas lane
    # kernels, which never touch the MXU for the d x d solves, sit at
    # ~2e-7). 'highest' restores true-f32 matmuls; the hot paths are
    # Pallas so the throughput cost is marginal.
    matmul_precision: str = "highest"  # 'default' | 'high' | 'highest'

    def apply(self):
        import jax
        jax.config.update("jax_enable_x64", self.precision == "double")
        if self.matmul_precision != "default":
            jax.config.update("jax_default_matmul_precision",
                              self.matmul_precision)
        if self.platform:
            jax.config.update("jax_platforms", self.platform)
        if self.debug:
            jax.config.update("jax_disable_jit", True)
        if self.debug_nans:
            jax.config.update("jax_debug_nans", True)


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout: axis names and sizes (-1 = inferred)."""
    axis_names: Tuple[str, ...] = ("chains",)
    axis_sizes: Optional[Tuple[int, ...]] = None

    def build(self, devices=None):
        from .parallel.mesh import make_mesh
        return make_mesh(self.axis_sizes, devices, self.axis_names)


@dataclass(frozen=True)
class SamplerConfig:
    """Sampler selection (reference --style/--gradient/--backward/--N)."""
    style: str = "kalman-1"   # kalman-1 | kalman-2 | csmc | csmc-guided | pgas
    parallel: bool = True     # parallel-in-time execution
    gradient: bool = False
    backward: bool = True
    ancestor_sampling: bool = False
    n_particles: int = 25
    resampling: str = "multinomial"


@dataclass(frozen=True)
class ExperimentConfig:
    backend: BackendConfig = field(default_factory=BackendConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    sampler: SamplerConfig = field(default_factory=SamplerConfig)
    run: RunConfig = field(default_factory=RunConfig)
    seed: int = 42
    n_chains: int = 1
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0          # 0 = only final


def _set(cfg, path, value):
    """Immutable nested update: _set(cfg, 'run.n_samples', 100)."""
    head, _, rest = path.partition(".")
    if rest:
        return dataclasses.replace(cfg, **{head: _set(getattr(cfg, head), rest, value)})
    current = getattr(cfg, head)
    if current is not None and not isinstance(value, type(current)):
        value = type(current)(value)
    return dataclasses.replace(cfg, **{head: value})


def from_args(base: Optional[ExperimentConfig] = None, **overrides) -> ExperimentConfig:
    """Build a config from dotted-path overrides, e.g.
    from_args(**{"run.n_samples": 10_000, "sampler.style": "csmc"})."""
    cfg = base or ExperimentConfig()
    for path, value in overrides.items():
        cfg = _set(cfg, path, value)
    return cfg
