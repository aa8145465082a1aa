"""Vendored minimal gradio stand-in for headless UI construction.

gradio is an optional dependency (not in this image); the flagship app's
`--check` mode and the UI-construction tests still need to execute
`create_demo_interface` end to end — every component constructor, layout
context and event wiring — to catch construction bugs.  This module mirrors
exactly the gradio surface the app uses; when real gradio is installed it is
never imported.

The stub records what a real Blocks would render: `blocks.components` holds
every constructed component, `component.events` every wired handler, so
tests can invoke the app's callbacks headlessly.
"""

from __future__ import annotations

from typing import Any, List, Optional

_BLOCKS_STACK: List["Blocks"] = []


class Component:
    """Base: records ctor args and registers with the active Blocks."""

    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.value = kwargs.get("value", args[1] if len(args) > 1 else None)
        self.label = kwargs.get("label")
        self.visible = kwargs.get("visible", True)
        self.events: List[tuple] = []   # (event, fn, inputs, outputs)
        if _BLOCKS_STACK:
            _BLOCKS_STACK[-1].components.append(self)

    def _wire(self, event: str, fn, inputs=None, outputs=None):
        self.events.append((event, fn, list(inputs or []), list(outputs or [])))
        return self

    def click(self, fn, inputs=None, outputs=None, **_):
        return self._wire("click", fn, inputs, outputs)

    def change(self, fn, inputs=None, outputs=None, **_):
        return self._wire("change", fn, inputs, outputs)

    def submit(self, fn, inputs=None, outputs=None, **_):
        return self._wire("submit", fn, inputs, outputs)


class _Layout(Component):
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class Row(_Layout):
    pass


class Column(_Layout):
    pass


class Markdown(Component):
    pass


class HTML(Component):
    pass


class Accordion(_Layout):
    pass


class Dropdown(Component):
    def __init__(self, choices=None, **kwargs):
        super().__init__(choices, **kwargs)
        self.choices = list(choices or [])


class Slider(Component):
    def __init__(self, minimum=0, maximum=1, **kwargs):
        super().__init__(minimum, maximum, **kwargs)
        self.minimum, self.maximum = minimum, maximum


class Checkbox(Component):
    pass


class Textbox(Component):
    pass


class Button(Component):
    pass


class Audio(Component):
    pass


class File(Component):
    pass


class Blocks(_Layout):
    def __init__(self, *args, **kwargs):
        self.components: List[Component] = []
        super().__init__(*args, **kwargs)

    def __enter__(self):
        _BLOCKS_STACK.append(self)
        return self

    def __exit__(self, *exc):
        _BLOCKS_STACK.pop()
        return False

    def queue(self, **_):
        return self

    def launch(self, **_):
        raise RuntimeError(
            "gradio_stub cannot serve a UI — install gradio to launch")

    # test/check conveniences -------------------------------------------------
    def find(self, label: str) -> Optional[Component]:
        for c in self.components:
            if c.label == label:
                return c
        return None

    def handlers(self) -> List[tuple]:
        return [e for c in self.components for e in c.events]


class _Themes:
    @staticmethod
    def Soft(**_):
        return "soft"


themes = _Themes()


def update(**kwargs) -> dict:
    return {"__type__": "update", **kwargs}


def _install() -> Any:
    """Register this module as `gradio` in sys.modules (only when the real
    package is absent) and return it."""
    import sys
    mod = sys.modules[__name__]
    sys.modules.setdefault("gradio", mod)
    return mod
