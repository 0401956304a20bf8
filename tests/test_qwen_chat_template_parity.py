"""Qwen chat-template golden parity (round-1 VERDICT missing item: QwenProcessor
token parity was structure-tested but never checked against HF
apply_chat_template — ref: data/model_processors.py:226-383).

Strategy: build the SAME conversation structure the reference builds
(system template + typed user-content list with audio placeholders), render
it through HF ``apply_chat_template`` with the official Qwen2-Audio chat
template on a locally-constructed Qwen2 tokenizer (byte-level BPE built
in-test, no downloads), and assert our ``build_qwen_prompt`` output is
byte-identical — hence token-identical under any tokenizer.
"""

import json

import pytest

transformers = pytest.importorskip("transformers")

from icl_speech_text_llm_tpu.data.prompts import build_qwen_prompt  # noqa: E402
from icl_speech_text_llm_tpu.registry import DatasetType  # noqa: E402

# The Qwen2-Audio-7B-Instruct chat template (tokenizer_config.json of the
# model the reference loads at data/model_processors.py:51-60).
QWEN2_AUDIO_CHAT_TEMPLATE = (
    "{% set audio_count = namespace(value=0) %}"
    "{% for message in messages %}"
    "{% if loop.first and message['role'] != 'system' %}"
    "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
    "{% endif %}"
    "<|im_start|>{{ message['role'] }}\n"
    "{% if message['content'] is string %}"
    "{{ message['content'] }}<|im_end|>\n"
    "{% else %}"
    "{% for content in message['content'] %}"
    "{% if 'audio' in content or 'audio_url' in content %}"
    "{% set audio_count.value = audio_count.value + 1 %}"
    "Audio {{ audio_count.value }}: <|audio_bos|><|AUDIO|><|audio_eos|>\n"
    "{% elif 'text' in content %}"
    "{{ content['text'] }}"
    "{% endif %}"
    "{% endfor %}"
    "<|im_end|>\n"
    "{% endif %}"
    "{% endfor %}"
    "{% if add_generation_prompt %}"
    "<|im_start|>assistant\n"
    "{% endif %}"
)

SPECIALS = ["<|im_start|>", "<|im_end|>", "<|audio_bos|>", "<|AUDIO|>", "<|audio_eos|>"]


@pytest.fixture(scope="module")
def qwen_tok(tmp_path_factory):
    """Minimal byte-level-BPE Qwen2 tokenizer built offline."""
    from transformers import Qwen2Tokenizer
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    d = tmp_path_factory.mktemp("qwen_tok")
    vocab = {ch: i for i, ch in enumerate(bytes_to_unicode().values())}
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    tok = Qwen2Tokenizer(str(d / "vocab.json"), str(d / "merges.txt"),
                         eos_token="<|endoftext|>", pad_token="<|endoftext|>")
    tok.add_special_tokens({"additional_special_tokens": SPECIALS})
    tok.chat_template = QWEN2_AUDIO_CHAT_TEMPLATE
    return tok


def _reference_conversation(template, text, examples, input_mode, fewshot_mode,
                            dataset_type=None, question=""):
    """The conversation the reference's QwenProcessor builds
    (ref: data/model_processors.py:240-383, studied behavior)."""
    user = []
    if dataset_type == DatasetType.SQA:
        if examples:
            user.append({"type": "text", "text": "Here are few examples to learn from:\n"})
            for i, ex in enumerate(examples):
                if fewshot_mode == "speech":
                    user.append({"type": "audio", "audio_url": f"question_{i}"})
                    user.append({"type": "audio", "audio_url": f"document_{i}"})
                    user.append({"type": "text", "text": f"Answer: {ex.get('completion', '')}\n"})
                else:
                    user.extend([
                        {"type": "text", "text": f"Question: {ex.get('question', '')}\n"},
                        {"type": "text", "text": f"Document: {ex.get('document', '')}\n"},
                        {"type": "text", "text": f"Answer: {ex.get('completion', '')}\n"},
                    ])
        user.append({"type": "text", "text": "\nNow analyze this input:\n"})
        if "speech" in input_mode:
            user.append({"type": "audio", "audio_url": "question"})
            if input_mode == "speech_and_text" and question:
                user.append({"type": "text", "text": f"Question text: {question}\n"})
            user.append({"type": "audio", "audio_url": "document"})
            if input_mode == "speech_and_text" and text:
                user.append({"type": "text", "text": f"Document text: {text}"})
        else:
            user.append({"type": "text", "text": f"Question: {question}\nDocument: {text}"})
    else:
        if examples:
            user.append({"type": "text", "text": "Here are few examples to learn from:\n"})
            for ex in examples:
                if fewshot_mode == "speech":
                    user.extend([
                        {"type": "audio", "audio_url": "dummy_url"},
                        {"type": "text", "text": f"Label: {ex.get('label', '')}\n"},
                    ])
                else:
                    user.extend([
                        {"type": "text", "text": f"Text: {ex.get('text', '')}\n"},
                        {"type": "text", "text": f"Label: {ex.get('label', '')}\n"},
                    ])
        user.append({"type": "text", "text": "\nNow analyze this input:\n"})
        if input_mode in ("speech_only", "speech_and_text"):
            user.append({"type": "audio", "audio_url": "dummy_url"})
        if input_mode == "speech_and_text" and text:
            user.append({"type": "text", "text": text})
        elif input_mode == "text_only" and text:
            user.append({"type": "text", "text": text})
    return [{"role": "system", "content": template},
            {"role": "user", "content": user}]


TEMPLATE = "Classify the sentiment of the speech as positive, negative or neutral."
EXAMPLES = [{"text": "what a lovely day", "label": "positive"},
            {"text": "this is awful", "label": "negative"}]
SQA_EXAMPLES = [{"question": "who wrote it", "document": "the doc text",
                 "completion": "the author"}]


CASES = [
    dict(input_mode="speech_only", fewshot_mode="text", examples=EXAMPLES, text=""),
    dict(input_mode="speech_only", fewshot_mode="speech", examples=EXAMPLES, text=""),
    dict(input_mode="speech_and_text", fewshot_mode="text", examples=EXAMPLES,
         text="the main utterance"),
    dict(input_mode="speech_only", fewshot_mode="none", examples=[], text=""),
    dict(input_mode="text_only", fewshot_mode="text", examples=EXAMPLES,
         text="text only input"),
]


@pytest.mark.parametrize("case", CASES, ids=[
    "speech_text_fs", "speech_speech_fs", "speech_and_text", "no_fs", "text_only"])
def test_default_prompt_matches_hf_chat_template(qwen_tok, case):
    conv = _reference_conversation(TEMPLATE, case["text"], case["examples"],
                                   case["input_mode"], case["fewshot_mode"])
    golden = qwen_tok.apply_chat_template(conv, add_generation_prompt=True,
                                          tokenize=False)
    plan = build_qwen_prompt(TEMPLATE, case["text"], case["examples"],
                             input_mode=case["input_mode"],
                             fewshot_mode=case["fewshot_mode"])
    assert plan.prompt == golden
    # token-level equality under the HF tokenizer
    assert qwen_tok(plan.prompt).input_ids == qwen_tok(golden).input_ids
    # every audio placeholder is a slot in the plan
    assert plan.prompt.count("<|AUDIO|>") == plan.num_slots


@pytest.mark.parametrize("mode,fs,q", [
    ("speech_only", "text", ""),
    ("speech_and_text", "text", "what is the answer"),
    ("speech_only", "speech", ""),
    ("text_only", "text", "what is the answer"),
])
def test_sqa_prompt_matches_hf_chat_template(qwen_tok, mode, fs, q):
    conv = _reference_conversation(TEMPLATE, "a document", SQA_EXAMPLES, mode, fs,
                                   dataset_type=DatasetType.SQA, question=q)
    golden = qwen_tok.apply_chat_template(conv, add_generation_prompt=True,
                                          tokenize=False)
    plan = build_qwen_prompt(TEMPLATE, "a document", SQA_EXAMPLES,
                             input_mode=mode, fewshot_mode=fs,
                             dataset_type=DatasetType.SQA, question=q)
    assert plan.prompt == golden
    assert qwen_tok(plan.prompt).input_ids == qwen_tok(golden).input_ids
