"""Problem registry with plugin-style auto-discovery.

Re-design of the reference's example auto-import (``multi-trust.jl:15-20``):
the Julia driver globs ``julia_opt/example_*.jl`` and ``@eval using``s each
file, so dropping a module matching the naming convention makes its problem
available to ``main()`` without touching the driver.  The equivalents here:

* built-in problems are registered lazily (name → factory + the reference's
  solver preset from ``multi-trust.jl:181-198``);
* :func:`register` adds a problem — call it directly or use it as a decorator
  on an :class:`~mioc_tpu.objectives.base.Objective` subclass;
* :func:`discover` imports every ``example_*.py`` in the plugin search path
  (``$MIOC_PROBLEMS_PATH`` entries, else the working directory).  A plugin
  module either calls :func:`register` itself or — purely by convention, like
  the reference — defines an Objective subclass; it is then auto-registered
  under the file stem (``example_foo.py`` → problem ``foo``), with an optional
  module-level ``PRESET`` dict supplying TRM parameter overrides.
"""

from __future__ import annotations

import glob
import importlib.util
import os
import sys
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

__all__ = ["ProblemSpec", "register", "get", "build", "available", "discover"]


@dataclass
class ProblemSpec:
    name: str
    factory: Callable            # factory(nt=...) -> Objective
    preset: dict = field(default_factory=dict)  # TRMParameters overrides


_REGISTRY: dict = {}

# Built-ins resolve lazily so `import mioc_tpu.models.registry` stays cheap
# (HeatObj pulls in the whole FEM stack).  Presets = multi-trust.jl:181-198.
_BUILTINS = {
    "fishing": ("mioc_tpu.models.fishing", "LVMObj",
                dict(beta=1e-4, delta0=2.0, p=np.inf)),
    "doubletank": ("mioc_tpu.models.doubletank", "DTMObj",
                   dict(beta=1e-5, delta0=2.0, p=np.inf)),
    "vanderpol": ("mioc_tpu.models.vanderpol", "VPOObj",
                  dict(beta=0.1, delta0=1.0, p=np.inf)),
    "convolution": ("mioc_tpu.models.convolution", "ConvObj",
                    dict(beta=1e-4, delta0=0.125, p=1)),
    "heat": ("mioc_tpu.models.heat", "HeatObj",
             dict(beta=1e-3, delta0=2.0, p=2)),
    "mixed": ("mioc_tpu.models.mixed_fishing", "LVMMixedObj",
              dict(beta=1e-4, delta0=2.0, p=np.inf)),
    # Not in the reference's main(): its .gitignore:7-11 withholds the fuller
    # example; preset chosen so the TRM resolves the chattering arc.
    "fuller": ("mioc_tpu.models.fuller", "FullerObj",
               dict(beta=1e-4, delta0=0.1, p=1)),
}


def register(name: str, factory: Optional[Callable] = None, *,
             preset: Optional[dict] = None):
    """Register ``factory`` (callable as ``factory(nt=...)``) under ``name``.
    With only ``name`` (and optional ``preset``) given, acts as a class
    decorator."""
    if factory is None:
        def deco(cls):
            register(name, cls, preset=preset)
            return cls

        return deco
    _REGISTRY[name] = ProblemSpec(name, factory, dict(preset or {}))
    return factory


def get(name: str) -> ProblemSpec:
    spec = _REGISTRY.get(name)
    if spec is None and name in _BUILTINS:
        mod, cls, preset = _BUILTINS[name]
        module = importlib.import_module(mod)
        spec = ProblemSpec(name, getattr(module, cls), dict(preset))
        _REGISTRY[name] = spec
    if spec is None:
        raise KeyError(
            f'I do not know the problem "{name}". '
            f"Available: {', '.join(available())}."
        )
    return spec


def build(name: str, nt: int):
    """Instantiate the problem's objective at ``nt`` time steps."""
    return get(name).factory(nt=nt)


def available() -> list:
    return sorted(set(_BUILTINS) | set(_REGISTRY))


def _auto_register(module, stem: str) -> bool:
    """Convention fallback: register the module's own Objective subclass
    under the ``example_<stem>`` file stem."""
    from ..objectives.base import Objective

    for val in vars(module).values():
        if (isinstance(val, type) and issubclass(val, Objective)
                and val.__module__ == module.__name__):
            register(stem, val, preset=getattr(module, "PRESET", None))
            return True
    return False


def discover(paths=None) -> list:
    """Import ``example_*.py`` plugin modules and return the newly registered
    problem names.  Default search path: the ``os.pathsep``-separated entries
    of ``$MIOC_PROBLEMS_PATH``, else the current working directory."""
    if paths is None:
        env = os.environ.get("MIOC_PROBLEMS_PATH", "")
        paths = [p for p in env.split(os.pathsep) if p] or [os.getcwd()]
    new = []
    for d in paths:
        for f in sorted(glob.glob(os.path.join(d, "example_*.py"))):
            stem = os.path.splitext(os.path.basename(f))[0][len("example_"):]
            modname = f"mioc_tpu_problem_{stem}"
            if modname in sys.modules:
                continue
            spec = importlib.util.spec_from_file_location(modname, f)
            if spec is None or spec.loader is None:
                continue
            module = importlib.util.module_from_spec(spec)
            sys.modules[modname] = module
            before = set(_REGISTRY)
            try:
                spec.loader.exec_module(module)
            except Exception as exc:  # a broken plugin must not kill the CLI
                del sys.modules[modname]
                print(f"warning: plugin {f} failed to import: {exc}",
                      file=sys.stderr)
                continue
            if set(_REGISTRY) == before:
                _auto_register(module, stem)
            new.extend(sorted(set(_REGISTRY) - before))
    return new
