from . import checker, checkpoint, engine, loss, optim, schedule  # noqa: F401
