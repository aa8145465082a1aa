"""Upstream-style Gradio demo (the simpler, single-model variant).

Equivalent of the reference's demo/gradio_demo.py (1302 lines): one model
loaded at startup, sde-dpmsolver++ scheduler on load (gradio_demo.py:173-179),
example-script loader with the 15-minute cap (gradio_demo.py:584-630),
streaming playback and a stop button — without the flagship app's model
manager, Script-AI client, or quantized loading.  Shares the orchestration
layer with the flagship app (gradio_app.VibeVoiceDemo).
"""

from __future__ import annotations

import argparse

from .gradio_app import VibeVoiceDemo, convert_to_16_bit_wav  # noqa: F401


def build_demo(model_name: str, checkpoints_dir=None, inference_steps: int = 10,
               debug: bool = False) -> VibeVoiceDemo:
    demo = VibeVoiceDemo(model_name=model_name, checkpoints_dir=checkpoints_dir,
                         inference_steps=inference_steps, load_on_demand=False,
                         debug=debug)
    # the upstream demo switches to sde-dpmsolver++ at load time
    model = demo.manager.ensure_loaded(model_name)
    model.generator.set_solver(algorithm_type="sde-dpmsolver++", solver_order=2)
    return demo


def create_demo_interface(demo: VibeVoiceDemo):
    import gradio as gr

    with gr.Blocks(title="VibeVoice-TPU demo") as ui:
        gr.Markdown("# VibeVoice-TPU demo\nSingle-model streaming demo.")
        with gr.Row():
            with gr.Column():
                num_speakers = gr.Slider(1, 4, value=1, step=1, label="Speakers")
                voice_dds = [gr.Dropdown(demo.voices.names() or ["(none)"],
                                         label=f"Voice {i + 1}") for i in range(4)]
                cfg_scale = gr.Slider(1.0, 2.0, value=1.3, step=0.05,
                                      label="CFG scale")
                steps = gr.Slider(5, 30, value=10, step=1, label="Diffusion steps")
            with gr.Column():
                example_dd = gr.Dropdown(demo.examples.names() or ["(none)"],
                                         label="Example scripts")
                load_btn = gr.Button("Load example")
                script_box = gr.Textbox(lines=10, label="Script")
                gen_btn = gr.Button("Generate", variant="primary")
                stop_btn = gr.Button("Stop")
                audio_out = gr.Audio(label="Audio", streaming=True, autoplay=True)

        def on_generate(n, script, v1, v2, v3, v4, cfg, st):
            voices = [v for v in (v1, v2, v3, v4) if v and v != "(none)"]
            for sr, chunk in demo.generate_podcast_streaming(
                    int(n), script, voices, cfg_scale=cfg, diffusion_steps=int(st)):
                yield sr, chunk

        def on_load_example(name):
            ex = demo.examples.get(name)
            if ex is None:
                return gr.update(), gr.update()
            k, script = ex
            return script, k

        gen_btn.click(on_generate,
                      [num_speakers, script_box, *voice_dds, cfg_scale, steps],
                      [audio_out])
        stop_btn.click(lambda: demo.stop())
        load_btn.click(on_load_example, [example_dd], [script_box, num_speakers])
    return ui


def main(argv=None):
    p = argparse.ArgumentParser(description="VibeVoice-TPU upstream-style demo")
    p.add_argument("--model", "--model_path", default="VibeVoice-1.5B")
    p.add_argument("--checkpoints-dir", default=None)
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--inference-steps", type=int, default=10)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--check", action="store_true",
                   help="construct the demo headlessly and exit")
    args = p.parse_args(argv)
    demo = build_demo(args.model, args.checkpoints_dir, args.inference_steps,
                      args.debug)
    if args.check:
        print(f"model: {demo.model_name} "
              f"(solver {demo.manager.current.generator.solver_cfg.algorithm_type})")
        print(f"examples: {demo.examples.names()}")
        print("check ok")
        return
    ui = create_demo_interface(demo)
    ui.queue().launch(server_name=args.host, server_port=args.port)


if __name__ == "__main__":
    main()
