// Native eval-path helpers (CPython C API, no pybind11).
//
// The reference shells out to Java jars for tokenization and runs
// pure-Python n-gram loops for BLEU/CIDEr
// (/root/reference/R2GenCSR/evalcap/tokenizer/ptbtokenizer.py:28-52,
//  bleu/bleu_scorer.py). This module provides:
//   ptb_tokenize_batch(list[str]) -> list[str]
//     PTB-style tokenization + punctuation removal, identical rules to
//     evalx/ptb_tokenizer.py (the Python reference implementation).
//   ngram_clip_counts(cand_tokens, ref_token_lists, n)
//     clipped n-gram match + candidate counts for corpus BLEU.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <map>
#include <set>
#include <sstream>
#include <string>
#include <vector>

namespace {

const std::set<std::string> kPunct = {
    "''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
    ".",  "?", "!",  ",", ":",     "-",     "--",    "...",  ";"};

void replace_all(std::string& s, const std::string& from,
                 const std::string& to) {
  size_t pos = 0;
  while ((pos = s.find(from, pos)) != std::string::npos) {
    s.replace(pos, from.size(), to);
    pos += to.size();
  }
}

bool is_word(char c) {
  return (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_';
}

std::string tokenize_one(const std::string& input) {
  std::string t;
  t.reserve(input.size() + 2);
  t.push_back(' ');
  for (char c : input) {
    if (c == '\n' || c == '\t') c = ' ';
    if (c >= 'A' && c <= 'Z') c = static_cast<char>(c - 'A' + 'a');
    t.push_back(c);
  }
  t.push_back(' ');

  // clitics: n't and 's/'re/'ve/'ll/'d/'m get separated.
  static const char* clitics[] = {"n't", "'s", "'re", "'ve",
                                  "'ll", "'d", "'m"};
  for (const char* cl : clitics) {
    const std::string c(cl);
    size_t pos = 0;
    while ((pos = t.find(c, pos)) != std::string::npos) {
      bool word_before = pos > 0 && is_word(t[pos - 1]);
      bool boundary_after =
          pos + c.size() >= t.size() || !is_word(t[pos + c.size()]);
      // for n't the char before the match is part of the clitic check
      if (word_before && boundary_after) {
        t.insert(pos, " ");
        pos += c.size() + 1;
      } else {
        pos += c.size();
      }
    }
  }

  replace_all(t, "...", " ... ");
  replace_all(t, "--", " -- ");
  replace_all(t, "(", " -LRB- ");
  replace_all(t, ")", " -RRB- ");
  replace_all(t, "{", " -LCB- ");
  replace_all(t, "}", " -RCB- ");
  replace_all(t, "[", " -LSB- ");
  replace_all(t, "]", " -RSB- ");

  std::string out;
  out.reserve(t.size());
  for (char c : t) {
    switch (c) {
      case '.': case ',': case '?': case '!': case ';': case ':':
      case '@': case '#': case '$': case '%': case '&': case '"':
        out.push_back(' ');
        out.push_back(c);
        out.push_back(' ');
        break;
      default:
        out.push_back(c);
    }
  }

  std::istringstream iss(out);
  std::string tok, joined;
  while (iss >> tok) {
    if (kPunct.count(tok)) continue;
    if (!joined.empty()) joined.push_back(' ');
    joined += tok;
  }
  return joined;
}

PyObject* ptb_tokenize_batch(PyObject*, PyObject* args) {
  PyObject* list;
  if (!PyArg_ParseTuple(args, "O", &list)) return nullptr;
  PyObject* seq = PySequence_Fast(list, "expected a sequence of str");
  if (!seq) return nullptr;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  PyObject* out = PyList_New(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PySequence_Fast_GET_ITEM(seq, i);
    Py_ssize_t len = 0;
    const char* data = PyUnicode_AsUTF8AndSize(item, &len);
    if (!data) {
      Py_DECREF(seq);
      Py_DECREF(out);
      return nullptr;
    }
    std::string joined = tokenize_one(std::string(data, len));
    PyList_SET_ITEM(out, i,
                    PyUnicode_FromStringAndSize(joined.data(),
                                                joined.size()));
  }
  Py_DECREF(seq);
  return out;
}

using Counter = std::map<std::vector<std::string>, long>;

Counter count_ngrams(const std::vector<std::string>& toks, int n) {
  Counter c;
  if (static_cast<int>(toks.size()) < n) return c;
  for (size_t i = 0; i + n <= toks.size(); ++i) {
    c[std::vector<std::string>(toks.begin() + i, toks.begin() + i + n)]++;
  }
  return c;
}

std::vector<std::string> split_ws(const std::string& s) {
  std::istringstream iss(s);
  std::vector<std::string> out;
  std::string tok;
  while (iss >> tok) out.push_back(tok);
  return out;
}

PyObject* ngram_clip_counts(PyObject*, PyObject* args) {
  const char* cand_c;
  PyObject* refs;
  int n;
  if (!PyArg_ParseTuple(args, "sOi", &cand_c, &refs, &n)) return nullptr;
  auto cand = split_ws(cand_c);
  Counter cand_counts = count_ngrams(cand, n);

  Counter max_ref;
  PyObject* seq = PySequence_Fast(refs, "expected a sequence of str");
  if (!seq) return nullptr;
  for (Py_ssize_t i = 0; i < PySequence_Fast_GET_SIZE(seq); ++i) {
    const char* r = PyUnicode_AsUTF8(PySequence_Fast_GET_ITEM(seq, i));
    if (!r) {
      Py_DECREF(seq);
      return nullptr;
    }
    for (auto& kv : count_ngrams(split_ws(r), n)) {
      long& slot = max_ref[kv.first];
      slot = std::max(slot, kv.second);
    }
  }
  Py_DECREF(seq);

  long clipped = 0, total = 0;
  for (auto& kv : cand_counts) {
    total += kv.second;
    auto it = max_ref.find(kv.first);
    if (it != max_ref.end()) clipped += std::min(kv.second, it->second);
  }
  return Py_BuildValue("(ll)", clipped, total);
}

PyMethodDef kMethods[] = {
    {"ptb_tokenize_batch", ptb_tokenize_batch, METH_VARARGS,
     "PTB tokenize + punctuation removal for a batch of sentences."},
    {"ngram_clip_counts", ngram_clip_counts, METH_VARARGS,
     "(clipped, total) n-gram counts of cand vs refs."},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "_native",
                       "native eval helpers", -1, kMethods};

}  // namespace

PyMODINIT_FUNC PyInit__native(void) { return PyModule_Create(&kModule); }
