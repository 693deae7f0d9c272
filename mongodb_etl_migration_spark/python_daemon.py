"""Python worker daemon with heavyweight libraries preimported.

pyspark's stock daemon (``pyspark.daemon``) forks one process per
worker request; each forked worker that later imports
numpy/pandas/pyarrow pays the full import cost (~1.5-2.5 s CPU each
on this box) inside the task that triggered the spawn. A 32-task
stage with two chained python evals per task (the media decode
chains: synth MapInPandas feeding fingerprint MapInPandas) wants
~64 live workers at once, and the factory re-spawns freely as the
pool churns across a long session — measured as 60-200 s of
executorRunTime per bench run attributable to nothing but repeated
imports (OPTIMIZATION_r14.md, m_audio_neardup investigation).

Preimporting in the DAEMON process makes every forked worker inherit
the already-initialized modules through fork copy-on-write — the
guide's "initialise heavyweight state once per task" (§4.5) moved one
level up, to once per daemon. Pure optimization: the worker protocol,
serialization, and every result are unchanged (``pyspark.daemon``'s
``manager`` is delegated to unmodified); a missing library just skips
its preimport and the worker imports it on demand, exactly as stock.
"""

for _mod in ("numpy", "pandas", "pyarrow", "pyarrow.compute"):
    try:  # pragma: no cover - import side effects only
        __import__(_mod)
    except Exception:  # pragma: no cover - env-dependent
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
