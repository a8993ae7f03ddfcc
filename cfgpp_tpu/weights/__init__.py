from cfgpp_tpu.weights.tokenizer import CLIPTokenizer, HashTokenizer, load_tokenizer

__all__ = ["CLIPTokenizer", "HashTokenizer", "load_tokenizer"]
