"""Engine configuration.

One small config dataclass per concern (the reference's YAML config +
constants.py collapse into these; see ``query_db/constants.py:19-22``
for the thresholds carried over).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BlockingConfig:
    shingle_k: int = 3            # token shingle width
    num_bands: int = 16
    rows_per_band: int = 4        # 64 perms; LSH threshold ~0.5 Jaccard
    minhash_seed: int = 2024
    # candidate-generation skew control
    hot_key_cap: int = 64         # block sizes above this get salted
    max_salts: int = 16
    num_buckets: int = 256        # co-location buckets for pair generation


@dataclass(frozen=True)
class ScoringConfig:
    jaccard_threshold: float = 0.5      # match decision (exact shingle Jaccard)
    est_prefilter: float = 0.35         # MinHash-estimate prefilter before verify
    name_threshold: float = 0.85        # reference query_db/constants.py:21
    entity_threshold: int = 85          # reference query_db/constants.py:22
    text_head_chars: int = 256          # Levenshtein window on normalized text


@dataclass(frozen=True)
class ClusterConfig:
    max_rounds: int = 30
    num_buckets: int = 256


@dataclass(frozen=True)
class ExecConfig:
    extract_batch_size: int = 256
    signature_batch_size: int = 512
    score_batch_size: int = 1024
    # actor-pool sizes; None => autoscale (1, cluster CPUs)
    extract_concurrency: tuple | None = None
    signature_concurrency: tuple | None = None
    score_concurrency: tuple | None = None


def pool_size(configured: tuple | None) -> tuple:
    """Actor-pool ``concurrency``: configured value or an autoscaling
    range sized to the cluster.

    Min 4 (ramp fast past cold start), max 16 per stage — measured
    sweet spot on 32 CPUs: a pool per stage of half the cores keeps
    every concurrent stage fed without paying 32 actor spin-ups per
    stage; capped at the CPU count on small clusters.
    """
    if configured is not None:
        return configured
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return (min(4, max(1, cpus // 2)), max(2, min(16, cpus)))


@dataclass(frozen=True)
class ReconcileConfig:
    blocking: BlockingConfig = field(default_factory=BlockingConfig)
    scoring: ScoringConfig = field(default_factory=ScoringConfig)
    cluster: ClusterConfig = field(default_factory=ClusterConfig)
    exec: ExecConfig = field(default_factory=ExecConfig)


def tune_data_context(quiet: bool = True) -> None:
    """Apply engine-wide Ray Data execution settings."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.execution_options.preserve_order = False
    if quiet:
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
