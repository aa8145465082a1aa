"""Committed gradio API contract (external truth for the vendored stub).

gradio is not installable in this environment, so the flagship UI
(`gradio_app.py`, covering reference main.py:1924-3150) executes against
`gradio_stub.py`.  A stub that "mirrors exactly what the app uses" is
circular — it cannot catch the app calling the real library wrongly.  This
module pins the EXTERNAL contract: for every gradio symbol the apps touch,
the constructor kwargs, event methods and serve-time kwargs as published by
real gradio (4.x public API; 5.x keeps this subset).

tests/test_gradio_contract.py asserts three directions:
  * every component construction / event wiring the apps perform stays
    inside this contract (app ↔ real gradio compatibility),
  * the stub's surface is exactly the contract's symbol set (stub drift
    fails loudly instead of silently absorbing bad calls),
  * when real gradio IS importable, the contract itself is validated
    against ``inspect.signature`` of the real classes.
"""

from __future__ import annotations

# Constructor kwargs accepted by real gradio for each symbol the apps use.
# Subset of the full gradio signature — extend ONLY after checking the real
# signature; the test fails on any kwarg not listed here.
COMPONENT_KWARGS = {
    "Blocks": {"theme", "title", "css", "js", "analytics_enabled",
               "fill_height", "head"},
    "Row": {"visible", "elem_id", "elem_classes", "equal_height",
            "variant"},
    "Column": {"scale", "min_width", "visible", "elem_id", "elem_classes",
               "variant"},
    "Accordion": {"label", "open", "visible", "elem_id", "elem_classes"},
    "Markdown": {"value", "label", "visible", "elem_id", "elem_classes",
                 "sanitize_html"},
    "HTML": {"value", "label", "visible", "elem_id", "elem_classes"},
    "Dropdown": {"choices", "value", "label", "info", "multiselect",
                 "allow_custom_value", "interactive", "visible", "scale",
                 "elem_id", "elem_classes", "filterable", "show_label"},
    "Slider": {"minimum", "maximum", "value", "step", "label", "info",
               "interactive", "visible", "scale", "elem_id", "elem_classes",
               "show_label"},
    "Checkbox": {"value", "label", "info", "interactive", "visible",
                 "scale", "elem_id", "elem_classes", "container",
                 "show_label"},
    "Textbox": {"value", "label", "placeholder", "lines", "max_lines",
                "info", "interactive", "visible", "scale", "elem_id",
                "elem_classes", "show_label", "container", "autoscroll",
                "type", "show_copy_button"},
    "Button": {"value", "variant", "size", "interactive", "visible",
               "scale", "elem_id", "elem_classes", "icon", "link"},
    "Audio": {"value", "label", "sources", "type", "streaming", "autoplay",
              "format", "interactive", "visible", "elem_id", "elem_classes",
              "show_download_button", "show_label", "editable", "loop"},
    "File": {"value", "label", "file_count", "file_types", "interactive",
             "visible", "elem_id", "elem_classes", "height", "show_label"},
}

# Positional parameters (in order) real gradio accepts before the kwargs.
COMPONENT_POSITIONAL = {
    "Blocks": [],
    "Row": [],
    "Column": [],
    "Accordion": ["label"],
    "Markdown": ["value"],
    "HTML": ["value"],
    "Dropdown": ["choices"],
    "Slider": ["minimum", "maximum"],
    "Checkbox": ["value"],
    "Textbox": ["value"],
    "Button": ["value"],
    "Audio": ["value"],
    "File": ["value"],
}

# Event methods on components: fn, inputs, outputs positionally or by
# keyword, plus these optional config kwargs (gradio EventListener API).
EVENT_METHODS = {"click", "change", "submit"}
EVENT_KWARGS = {"fn", "inputs", "outputs", "api_name", "queue",
                "show_progress", "concurrency_limit", "scroll_to_output",
                "every", "trigger_mode", "js"}

# Blocks serve-time methods.
QUEUE_KWARGS = {"max_size", "default_concurrency_limit", "api_open",
                "status_update_rate"}
LAUNCH_KWARGS = {"server_name", "server_port", "share", "show_error",
                 "inbrowser", "quiet", "max_threads", "auth", "ssl_keyfile",
                 "ssl_certfile", "prevent_thread_lock", "allowed_paths",
                 "favicon_path", "show_api"}

# Module-level functions the apps use.
MODULE_FUNCTIONS = {"update"}
# Theme constructors used (gr.themes.*).
THEMES = {"Soft"}
