from . import graphics, losses, schedules, sh, sphere, system, transforms  # noqa: F401
