from . import checker, checkpoint, loss, optim, schedule  # noqa: F401
