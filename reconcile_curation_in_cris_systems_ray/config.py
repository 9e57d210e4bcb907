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
    # candidate-generation skew control.  hot_key_cap is APPROXIMATE
    # under the small-input driver-merge plan: the hot-key scan drops
    # per-batch-unique keys before merging, so counts for keys spread
    # thinly across batches are underestimates and their salt factor
    # may be lower than count/cap.  This only affects load balance
    # (the emitted pair set is identical either way, and the
    # degenerate-clique guard still bounds any residual group); the
    # distributed groupby plan above DRIVER_MERGE_MAX_ROWS is exact.
    hot_key_cap: int = 64         # block sizes above this get salted
    max_salts: int = 16
    num_buckets: int = 256        # co-location buckets for pair generation


@dataclass(frozen=True)
class ScoringConfig:
    jaccard_threshold: float = 0.5      # match decision (exact shingle Jaccard)
    est_prefilter: float = 0.35         # MinHash-estimate prefilter before verify
    name_threshold: float = 0.85        # reference query_db/constants.py:21
    entity_threshold: int = 85          # reference query_db/constants.py:22
    # Levenshtein window on normalized text: O(len^2) per pair, so the
    # window is the scorer's cost knob (64 chars ~= 16x cheaper than 256
    # with near-identical discrimination on page heads)
    text_head_chars: int = 64


@dataclass(frozen=True)
class ClusterConfig:
    max_rounds: int = 30
    num_buckets: int = 256
    # edge count below which connected-components finishes with a
    # single driver-side union-find pass instead of more shuffle rounds
    driver_finish_edges: int = 1_000_000


@dataclass(frozen=True)
class ExecConfig:
    # False (default): map stages run as task pools with per-worker
    # cached state — Ray fuses consecutive task operators (extract +
    # signature execute in ONE task per block, no object-store hop) and
    # there is no actor-pool ramp-up.  Measured 2-3x faster end-to-end
    # on this pipeline.  True: stages run as actor pools (bounded
    # number of state copies) — the right mode when per-worker state is
    # genuinely heavy (multi-second model load).
    use_actor_pools: bool = False
    # batch sizes apply in actor-pool mode; task mode uses per-block
    # batches (batch_size=None) to preserve fusion and task parallelism
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

    The MINIMUM is a hard CPU reservation per pool.  A pipeline runs
    up to two actor pools plus task operators (reads, shuffles)
    concurrently, so minimums must never sum to the whole cluster —
    min 4+4 on an 8-CPU node deadlocked the pipeline whenever a task
    operator fed the pools.  cpus//8 keeps the measured fast ramp on
    32 CPUs (min 4 per pool) while reserving at most 1/4 of a small
    cluster.  Max 16 per stage: past that, actor spin-up cost beats
    the extra parallelism on a single node.
    """
    if configured is not None:
        return configured
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return (max(1, cpus // 8), max(2, min(16, cpus)))


@dataclass(frozen=True)
class ReconcileConfig:
    blocking: BlockingConfig = field(default_factory=BlockingConfig)
    scoring: ScoringConfig = field(default_factory=ScoringConfig)
    cluster: ClusterConfig = field(default_factory=ClusterConfig)
    exec: ExecConfig = field(default_factory=ExecConfig)

    @classmethod
    def from_dict(cls, d: dict) -> "ReconcileConfig":
        """Build a config from a nested dict (the reference's YAML
        config surface, ``query_db/config_sample.yaml:9-76`` /
        ``workflows.py:33-54``).  Unknown keys raise — config typos
        must not silently fall back to defaults."""
        sections = {"blocking": BlockingConfig, "scoring": ScoringConfig,
                    "cluster": ClusterConfig, "exec": ExecConfig}
        unknown = set(d) - set(sections)
        if unknown:
            raise ValueError(f"unknown config sections: {sorted(unknown)}")
        kwargs = {}
        for name, section_cls in sections.items():
            sub = d.get(name, {})
            valid = {f.name for f in
                     section_cls.__dataclass_fields__.values()}
            bad = set(sub) - valid
            if bad:
                raise ValueError(
                    f"unknown keys in [{name}]: {sorted(bad)}")
            # YAML lists -> tuples (concurrency ranges)
            sub = {k: tuple(v) if isinstance(v, list) else v
                   for k, v in sub.items()}
            kwargs[name] = section_cls(**sub)
        return cls(**kwargs)

    @classmethod
    def from_yaml(cls, path: str) -> "ReconcileConfig":
        """Load from a YAML file (PyYAML ships with Ray)."""
        import yaml

        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f) or {})


def tune_data_context(quiet: bool = True) -> None:
    """Apply engine-wide Ray Data execution settings."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.execution_options.preserve_order = False
    if quiet:
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
