"""Per-request sequence state machine.

Equivalent of the reference's `core/sequence.py:6-109` — prefill → decode →
finished lifecycle, token accumulation, sampling params, timing — without the
cross-rank dict serialization (SPMD JAX needs no per-step object broadcast,
see SURVEY.md §5 "Distributed communication backend").
"""

from __future__ import annotations

import enum
import itertools
import time
from dataclasses import dataclass, field
from typing import Optional

_seq_counter = itertools.count()


class SeqState(enum.Enum):
    WAITING = "waiting"        # queued, no KV allocated
    PREFILLING = "prefilling"  # chunked prefill in progress
    RUNNING = "running"        # decoding
    FINISHED = "finished"


class FinishReason(enum.Enum):
    STOP = "stop"              # hit EOS
    LENGTH = "length"          # hit max_new_tokens / max_model_len
    ABORTED = "aborted"


@dataclass
class SamplingParams:
    temperature: float = 0.7
    top_p: float = 0.9
    top_k: int = 64
    max_new_tokens: int = 512
    stop_token_ids: tuple[int, ...] = ()
    # stop strings: finish (reason "stop") once the DECODED output contains
    # any of these (requires an engine tokenizer; the completing token is
    # included in the output). Beyond the reference; vLLM's `stop=[...]`.
    stop: tuple[str, ...] = ()
    ignore_eos: bool = False
    # per-token logprobs: 0 = off; N > 0 returns each output token's
    # log-probability plus the top-min(N, EngineConfig.logprobs_k)
    # alternatives (raw-logit log-softmax). Requires an engine built with
    # logprobs_k > 0 (the logprob-emitting step variant is compiled and
    # warmed only then).
    logprobs: int = 0
    # Sampling penalties (require EngineConfig.enable_penalties):
    # presence/frequency follow OpenAI semantics (over GENERATED tokens);
    # repetition follows HF/vLLM (over prompt + generated, 1.0 = off).
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    # OpenAI logit_bias: ((token_id, bias), ...) added to the logits
    # before sampling (max 32 entries; requires enable_penalties).
    logit_bias: tuple = ()
    # Per-request seed (None = unseeded): stochastic sampling becomes a
    # pure function of (seed, output position) — reproducible regardless
    # of batch composition. Single-rank engines only.
    seed: Optional[int] = None

    @property
    def has_penalties(self) -> bool:
        return (self.presence_penalty != 0.0 or self.frequency_penalty != 0.0
                or self.repetition_penalty != 1.0 or bool(self.logit_bias))


@dataclass
class Sequence:
    prompt_token_ids: list[int]
    sampling: SamplingParams = field(default_factory=SamplingParams)
    priority: int = 0    # higher = scheduled first; ties broken by age
    adapter_id: int = 0  # LoRA adapter slot (0 = base model)
    seq_id: int = field(default_factory=lambda: next(_seq_counter))
    arrival_time: float = field(default_factory=time.monotonic)
    state: SeqState = SeqState.WAITING
    output_token_ids: list[int] = field(default_factory=list)
    # one entry per output token when sampling.logprobs > 0:
    # {"logprob": float, "top": [[token_id, logprob], ...]}
    logprobs: list = field(default_factory=list)
    num_prefilled: int = 0               # tokens of prompt already in KV cache
    finish_reason: Optional[FinishReason] = None
    first_token_time: Optional[float] = None
    finish_time: Optional[float] = None
    prompt_text: Optional[str] = None

    # -- derived ----------------------------------------------------------

    @property
    def prompt_len(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_tokens(self) -> int:
        return self.prompt_len + len(self.output_token_ids)

    @property
    def num_cached(self) -> int:
        """Tokens whose KV is in cache (prefilled prompt + generated)."""
        return self.num_prefilled + len(self.output_token_ids)

    @property
    def is_finished(self) -> bool:
        return self.state == SeqState.FINISHED

    @property
    def prefill_remaining(self) -> int:
        return self.prompt_len - self.num_prefilled

    @property
    def last_token_id(self) -> int:
        if self.output_token_ids:
            return self.output_token_ids[-1]
        return self.prompt_token_ids[-1]

    # -- transitions ------------------------------------------------------

    def append_output(self, token_id: int, eos_token_id: Optional[int]) -> bool:
        """Record a generated token; returns True if the sequence finished."""
        if self.first_token_time is None:
            self.first_token_time = time.monotonic()
        self.output_token_ids.append(token_id)
        stop_ids = set(self.sampling.stop_token_ids)
        if eos_token_id is not None and not self.sampling.ignore_eos:
            stop_ids.add(eos_token_id)
        if token_id in stop_ids:
            self.finish(FinishReason.STOP)
            return True
        if len(self.output_token_ids) >= self.sampling.max_new_tokens:
            self.finish(FinishReason.LENGTH)
            return True
        return False

    def finish(self, reason: FinishReason) -> None:
        self.state = SeqState.FINISHED
        self.finish_reason = reason
        self.finish_time = time.monotonic()
