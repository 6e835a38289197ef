"""Import scaffolding for loading the reference repo (read-only, at
/root/reference/src) as a test oracle.

The reference imports visualization/pipeline deps that are absent in this
environment (torchvision, matplotlib, tqdm, diffusers); install minimal
module stubs with real ModuleSpecs (transformers probes torchvision via
importlib.util.find_spec — a spec-less stub breaks later tests) and put the
reference src root on sys.path so `utils.utils` / `modules.edit` import.

None of the reference code is copied into this repo; it is imported from
/root/reference purely as an oracle inside tests.
"""

import importlib.machinery
import sys
import types

REF_SRC = "/root/reference/src"

_STUBS = {
    "tqdm": {"tqdm": lambda x, **kw: x},
    "torchvision": {},
    "torchvision.utils": {"save_image": lambda *a, **kw: None},
    # dataset constructors only (never instantiated by the oracle tests)
    "torchvision.transforms": {"Compose": type("Compose", (), {}),
                               "ToTensor": type("ToTensor", (), {}),
                               "Normalize": type("Normalize", (), {})},
    "matplotlib": {},
    "matplotlib.pyplot": {},
    "skimage": {},
    "diffusers": {n: type(n, (), {}) for n in
                  ("DDIMScheduler", "DDIMPipeline", "StableDiffusionPipeline",
                   "DiffusionPipeline", "DDIMInverseScheduler",
                   "LatentConsistencyModelPipeline", "LCMScheduler")},
    "diffusers.utils": {"pt_to_pil": lambda x: x},
}


def install_reference_path():
    """sys.path + stub setup; idempotent, safe alongside the per-file stubs in
    the converter golden tests (they check `name not in sys.modules` too)."""
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    for name, attrs in _STUBS.items():
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            # mark stubs as packages so `import name.sub` resolves through them
            mod.__path__ = []
            mod.__spec__.submodule_search_locations = []
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
        elif getattr(sys.modules[name].__spec__, "loader", True) is None:
            # an earlier test file installed a barer stub (e.g. torchvision
            # without save_image) — fill in whatever attrs it lacks so test
            # ORDER cannot decide whether the oracle engine can run
            mod = sys.modules[name]
            for k, v in attrs.items():
                if not hasattr(mod, k):
                    setattr(mod, k, v)
            if not hasattr(mod, "__path__"):
                mod.__path__ = []
                if getattr(mod, "__spec__", None) is not None:
                    mod.__spec__.submodule_search_locations = []
        if "." in name:
            parent, child = name.rsplit(".", 1)
            if parent in sys.modules and not hasattr(sys.modules[parent], child):
                setattr(sys.modules[parent], child, sys.modules[name])
