"""Bundled data resources.

stopwords.json: per-language stopword lists — public word-list data
(the same lists newspaper3k ships in resources/text/stopwords-*.txt and
resources/misc/stopwords-nlp-en.txt, which trace back to the
python-goose project, Apache-2.0). Consolidated into one JSON so
executors load a single broadcast-sized file; the 'nlp-en' key is the
dedicated keyword-extraction list. These lists are behavioral
parameters of the extraction semantics (SURVEY.md §1.5), not code.
"""
