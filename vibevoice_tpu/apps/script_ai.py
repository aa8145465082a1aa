"""OpenAI-compatible LLM script generation client.

Host-side re-provision of the flagship app's "Script AI" feature
(reference: main.py:1232-1921): generate a multi-speaker podcast script from a
topic using any OpenAI-compatible chat endpoint, with

  * env / .env / CLI precedence for base-url + key + model (main.py:1357-1380)
  * base-URL normalization (scheme, trailing /v1) (main.py:1394-1430)
  * retry with exponential backoff x3 (main.py:1472-1526)
  * multi-shape response parsing (choices/message/content variants, raw text)
  * truncated-response shorten-and-retry (main.py:1630-1692)
  * cleanup into strict "Speaker N: ..." lines

Uses stdlib urllib — no `openai` package dependency.
"""

from __future__ import annotations

import json
import os
import re
import time
import urllib.error
import urllib.request
from dataclasses import dataclass
from typing import Optional


def load_dotenv(path: str = ".env") -> dict:
    """Minimal .env loader (replaces python-dotenv)."""
    vals = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#") or "=" not in line:
                    continue
                k, v = line.split("=", 1)
                vals[k.strip()] = v.strip().strip("'\"")
    return vals


def normalize_base_url(url: str) -> str:
    url = url.strip().rstrip("/")
    if not url:
        return url
    if not re.match(r"^https?://", url):
        url = "http://" + url
    if not url.endswith("/v1"):
        url += "/v1"
    return url


@dataclass
class ScriptAIConfig:
    base_url: str = ""
    api_key: str = ""
    model: str = ""
    temperature: float = 0.8
    max_tokens: int = 4096
    timeout: float = 120.0
    retries: int = 3

    @classmethod
    def from_env(cls, cli_overrides: Optional[dict] = None) -> "ScriptAIConfig":
        """Precedence: defaults < .env < process env < CLI (main.py:1357-1380)."""
        dotenv = load_dotenv()
        def pick(*keys, default=""):
            for source in (cli_overrides or {}, os.environ, dotenv):
                for k in keys:
                    v = source.get(k)
                    if v:
                        return v
            return default
        return cls(
            base_url=normalize_base_url(pick("base_url", "SCRIPT_AI_URL",
                                             "OPENAI_BASE_URL", "LLM_BASE_URL")),
            api_key=pick("api_key", "SCRIPT_AI_API_KEY", "OPENAI_API_KEY",
                         "LLM_API_KEY"),
            model=pick("model", "SCRIPT_AI_MODEL", "OPENAI_MODEL", "LLM_MODEL",
                       default="gpt-4o-mini"),
        )


SYSTEM_TEMPLATE = (
    "You write natural, engaging podcast scripts. Output ONLY lines of the "
    "form 'Speaker N: text' with N in 1..{n}. No headings, no markdown, no "
    "stage directions. {minutes} minutes of conversation about the topic.")


class ScriptAIClient:
    def __init__(self, config: Optional[ScriptAIConfig] = None, debug: bool = False):
        self.config = config or ScriptAIConfig.from_env()
        self.debug = debug

    # -- HTTP ----------------------------------------------------------------
    def _post(self, payload: dict) -> dict:
        url = f"{self.config.base_url}/chat/completions"
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json",
                     "Authorization": f"Bearer {self.config.api_key}"})
        last_err: Optional[Exception] = None
        for attempt in range(self.config.retries):
            try:
                if self.debug:
                    # request/response dumps (reference main.py:1394-1470);
                    # the API key never reaches the log
                    print(f"[script-ai] POST {url} attempt {attempt + 1}\n"
                          f"[script-ai] request: {json.dumps(payload)[:2000]}")
                with urllib.request.urlopen(req, timeout=self.config.timeout) as resp:
                    out = json.loads(resp.read().decode())
                    if self.debug:
                        print(f"[script-ai] response: {json.dumps(out)[:2000]}")
                    return out
            except (urllib.error.URLError, urllib.error.HTTPError, TimeoutError,
                    json.JSONDecodeError) as e:  # noqa: PERF203
                last_err = e
                wait = 2.0 ** attempt
                if self.debug:
                    print(f"[script-ai] error: {e}; retrying in {wait:.0f}s")
                time.sleep(wait)
        raise RuntimeError(f"Script AI request failed after "
                           f"{self.config.retries} attempts: {last_err}")

    # -- response parsing (multi-shape, main.py:1594-1614) --------------------
    @staticmethod
    def _extract_text(resp: dict) -> str:
        if isinstance(resp, str):
            return resp
        choices = resp.get("choices") or []
        if choices:
            c0 = choices[0]
            msg = c0.get("message") or {}
            for key in ("content", "text"):
                if isinstance(msg.get(key), str) and msg[key].strip():
                    return msg[key]
            if isinstance(c0.get("text"), str):
                return c0["text"]
            if isinstance(c0.get("delta", {}).get("content"), str):
                return c0["delta"]["content"]
        for key in ("output_text", "content", "text"):
            if isinstance(resp.get(key), str):
                return resp[key]
        raise ValueError(f"Unrecognized LLM response shape: {list(resp.keys())}")

    @staticmethod
    def _was_truncated(resp: dict) -> bool:
        choices = resp.get("choices") or [{}]
        return choices[0].get("finish_reason") == "length"

    # -- cleanup pipeline (main.py:1694-1921) ----------------------------------
    @staticmethod
    def clean_script(text: str, num_speakers: int) -> str:
        # strip code fences / json wrappers
        text = re.sub(r"^```[a-zA-Z]*\n?|```$", "", text.strip(), flags=re.MULTILINE)
        try:
            data = json.loads(text)
            if isinstance(data, list):
                text = "\n".join(f"Speaker {d.get('speaker', 1)}: {d.get('text', '')}"
                                 for d in data if isinstance(d, dict))
        except (json.JSONDecodeError, TypeError):
            pass
        lines = []
        for raw in text.split("\n"):
            raw = raw.strip()
            if not raw:
                continue
            raw = re.sub(r"^[*#>\-\s]+", "", raw)            # markdown litter
            raw = re.sub(r"[*_]+$", "", raw).strip()
            m = re.match(r"^(?:Speaker\s*)?(\d+)\s*[:.\)]\s*(.+)$", raw,
                         re.IGNORECASE)
            if m:
                sid = max(1, min(int(m.group(1)), num_speakers))
                body = m.group(2).strip()
                if body:
                    lines.append(f"Speaker {sid}: {body}")
                continue
            m = re.match(r"^([A-Za-z][\w .\-]{0,30})\s*:\s*(.+)$", raw)
            if m and lines:
                # named speakers -> cycle through ids in order of appearance
                lines.append(f"Speaker {(len(lines) % num_speakers) + 1}: "
                             f"{m.group(2).strip()}")
            elif lines:
                # continuation line -> append to previous turn
                lines[-1] = lines[-1] + " " + raw
        return "\n".join(lines)

    # -- main entry -------------------------------------------------------------
    def generate_script(self, topic: str, num_speakers: int = 2,
                        duration_minutes: float = 2.0) -> str:
        if not self.config.base_url:
            raise RuntimeError(
                "Script AI is not configured: set OPENAI_BASE_URL / LLM_BASE_URL "
                "(and OPENAI_API_KEY) in the environment or a .env file")
        max_tokens = self.config.max_tokens
        for attempt in range(2):
            payload = {
                "model": self.config.model,
                "temperature": self.config.temperature,
                "max_tokens": max_tokens,
                "messages": [
                    {"role": "system", "content": SYSTEM_TEMPLATE.format(
                        n=num_speakers, minutes=duration_minutes)},
                    {"role": "user", "content": f"Topic: {topic}"},
                ],
            }
            resp = self._post(payload)
            text = self._extract_text(resp)
            script = self.clean_script(text, num_speakers)
            if script and not self._was_truncated(resp):
                return script
            if script and attempt == 1:
                return script  # accept truncated output on the final try
            # truncated: shorten and retry (main.py:1630-1692)
            duration_minutes = max(1.0, duration_minutes / 2)
            max_tokens = max(512, max_tokens // 2)
        raise RuntimeError("Script AI returned no usable script")
