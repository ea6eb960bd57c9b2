"""CLI job entrypoint — the ``ray job submit`` target.

Usage::

    ray job submit -- python -m spacy_llm_ray.run job.yaml
    python -m spacy_llm_ray.run job.yaml        # standalone (local session)

Owns a Ray session ONLY when none exists (the driver contract forbids the
library from initialising Ray when embedded)."""

from __future__ import annotations

import json
import sys


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m spacy_llm_ray.run <job.yaml|job.json>", file=sys.stderr)
        return 2

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        from .config import run_job

        summary = run_job(argv[0])
        print(json.dumps(summary))
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
