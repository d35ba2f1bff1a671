"""Experiment logging: wandb when available/requested, stdout otherwise."""

from __future__ import annotations


def make_log_fn(project: str | None, config=None, name: str | None = None):
    """Returns (log_fn(epoch, phase, metrics) | None, finish_fn)."""
    if not project:
        return None, lambda: None
    try:
        import wandb
    except ImportError:
        print("wandb not installed; logging to stdout only")
        return None, lambda: None

    run = wandb.init(project=project, config=config, name=name)

    def log_fn(epoch, phase, metrics):
        run.log({"epoch": epoch,
                 **{f"{phase} {k}": v for k, v in metrics.items()}})

    return log_fn, run.finish
