from .convert import (
    convert_torch_state_dict,
    fixture_state_dict,
    fixture_variables,
    load,
    load_any,
    load_pth,
    save,
)

__all__ = [
    "convert_torch_state_dict",
    "fixture_state_dict",
    "fixture_variables",
    "load",
    "load_any",
    "load_pth",
    "save",
]
