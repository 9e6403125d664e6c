"""Char-level tokenizer over a vocab file.

Behavior parity with reference
ppasr/data_utils/featurizer/text_featurizer.py:1-59: vocab file holds
``token\tcount`` lines; space maps to ``<space>``; OOV chars map to ``<unk>``.
Vocab layout (written by the trainer, reference trainer.py:479-487):
``<blank>``(0), ``<unk>``(1), chars..., ``<eos>``(last).
"""


class TextFeaturizer:
    def __init__(self, vocab_filepath: str):
        self.unk = "<unk>"
        self._vocab_dict, self._vocab_list = self._load_vocab(vocab_filepath)

    def featurize(self, text: str) -> list:
        """Text → list of token ids (char-level)."""
        ids = []
        for token in list(text.strip()):
            if token == ' ':
                token = '<space>'
            if token not in self._vocab_dict:
                token = self.unk
            ids.append(self._vocab_dict[token])
        return ids

    @property
    def vocab_size(self) -> int:
        return len(self._vocab_list)

    @property
    def vocab_list(self) -> list:
        return self._vocab_list

    @staticmethod
    def _load_vocab(vocab_filepath: str):
        with open(vocab_filepath, 'r', encoding='utf-8') as f:
            vocab_list = [line.rstrip('\n').split('\t')[0] for line in f
                          if line.strip()]
        vocab_dict = {token: i for i, token in enumerate(vocab_list)}
        return vocab_dict, vocab_list
