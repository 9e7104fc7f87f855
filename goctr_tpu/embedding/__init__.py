from goctr_tpu.embedding.dictionary import Dictionary
from goctr_tpu.embedding.word2vec import Word2Vec, Word2VecOptions
from goctr_tpu.embedding.store import (
    EmbeddingMap, load_embedding_map, save_embedding_map, train_embedding,
)
from goctr_tpu.embedding.search import Searcher
