// CLIP byte-pair-encoding tokenizer — native runtime component.
//
// Replaces the Python-side transformers CLIPTokenizer on the data-loading hot
// path (the reference tokenizes every caption in its torch DataLoader workers;
// SURVEY.md §2 #16/#17). Loads a vocab.json + merges.txt pair, applies the
// CLIP pre-tokenization regex, lowercasing, byte-level encoding and BPE
// merges, and emits fixed-length id buffers with BOS/EOS/pad framing.
//
// Exposed as a C ABI for ctypes (pcm_tpu/data/native_tokenizer.py).
//
// Build: see native/Makefile  ->  libclip_bpe.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <mutex>
#include <sstream>
#include <string>
#include <unordered_map>
#include <utility>
#include <vector>

namespace {

struct PairHash {
  size_t operator()(const std::pair<std::string, std::string>& p) const {
    return std::hash<std::string>()(p.first) * 1000003u ^
           std::hash<std::string>()(p.second);
  }
};

struct Tokenizer {
  std::unordered_map<std::string, int> vocab;
  std::unordered_map<std::pair<std::string, std::string>, int, PairHash> ranks;
  int bos_id = 0, eos_id = 0, pad_id = 0;
  // byte -> unicode (as UTF-8 string) per GPT-2 byte encoder
  std::string byte_enc[256];
};

std::string utf8_of(int cp) {
  std::string out;
  if (cp < 0x80) {
    out.push_back(static_cast<char>(cp));
  } else if (cp < 0x800) {
    out.push_back(static_cast<char>(0xC0 | (cp >> 6)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    out.push_back(static_cast<char>(0xE0 | (cp >> 12)));
    out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
  return out;
}

void build_byte_encoder(Tokenizer* t) {
  // printable bytes map to themselves; the rest shift into 256+
  std::vector<int> bs;
  for (int b = '!'; b <= '~'; ++b) bs.push_back(b);
  for (int b = 0xA1; b <= 0xAC; ++b) bs.push_back(b);
  for (int b = 0xAE; b <= 0xFF; ++b) bs.push_back(b);
  std::vector<bool> present(256, false);
  for (int b : bs) present[b] = true;
  int n = 0;
  std::vector<int> cs(256);
  for (int b = 0; b < 256; ++b) {
    if (present[b]) {
      cs[b] = b;
    } else {
      cs[b] = 256 + n;
      ++n;
    }
  }
  for (int b = 0; b < 256; ++b) t->byte_enc[b] = utf8_of(cs[b]);
}

// Minimal JSON parse for {"token": id, ...} vocab files (string keys with
// escapes, integer values).
bool parse_vocab(const std::string& text, Tokenizer* t) {
  size_t i = 0, n = text.size();
  auto skip_ws = [&] { while (i < n && (text[i] == ' ' || text[i] == '\n' || text[i] == '\r' || text[i] == '\t' || text[i] == ',')) ++i; };
  skip_ws();
  if (i >= n || text[i] != '{') return false;
  ++i;
  while (true) {
    skip_ws();
    if (i < n && text[i] == '}') break;
    if (i >= n || text[i] != '"') return false;
    ++i;
    std::string key;
    while (i < n && text[i] != '"') {
      if (text[i] == '\\' && i + 1 < n) {
        char c = text[i + 1];
        i += 2;
        switch (c) {
          case 'n': key.push_back('\n'); break;
          case 't': key.push_back('\t'); break;
          case 'r': key.push_back('\r'); break;
          case '\\': key.push_back('\\'); break;
          case '"': key.push_back('"'); break;
          case '/': key.push_back('/'); break;
          case 'u': {
            if (i + 4 <= n) {
              int cp = std::stoi(text.substr(i, 4), nullptr, 16);
              key += utf8_of(cp);
              i += 4;
            }
            break;
          }
          default: key.push_back(c);
        }
      } else {
        key.push_back(text[i]);
        ++i;
      }
    }
    ++i;  // closing quote
    skip_ws();
    if (i >= n || text[i] != ':') return false;
    ++i;
    skip_ws();
    size_t j = i;
    while (j < n && (isdigit(text[j]) || text[j] == '-')) ++j;
    int id = std::stoi(text.substr(i, j - i));
    i = j;
    t->vocab.emplace(std::move(key), id);
  }
  return true;
}

std::vector<std::string> bpe(const Tokenizer& t, const std::string& token) {
  // split into unicode chars (token is already byte-encoded UTF-8)
  std::vector<std::string> word;
  for (size_t i = 0; i < token.size();) {
    size_t len = 1;
    unsigned char c = token[i];
    if ((c & 0xE0) == 0xC0) len = 2;
    else if ((c & 0xF0) == 0xE0) len = 3;
    else if ((c & 0xF8) == 0xF0) len = 4;
    word.push_back(token.substr(i, len));
    i += len;
  }
  if (word.empty()) return word;
  word.back() += "</w>";  // CLIP end-of-word marker

  while (word.size() > 1) {
    int best_rank = INT32_MAX;
    size_t best_i = 0;
    for (size_t i = 0; i + 1 < word.size(); ++i) {
      auto it = t.ranks.find({word[i], word[i + 1]});
      if (it != t.ranks.end() && it->second < best_rank) {
        best_rank = it->second;
        best_i = i;
      }
    }
    if (best_rank == INT32_MAX) break;
    word[best_i] += word[best_i + 1];
    word.erase(word.begin() + best_i + 1);
  }
  return word;
}

bool is_letter(unsigned char c) { return isalpha(c); }
bool is_digit_c(unsigned char c) { return isdigit(c); }
bool is_space_c(unsigned char c) { return isspace(c); }

// CLIP pre-tokenizer (simplified for the BMP/ASCII captions of image
// datasets): contractions, letter runs, digit runs, other-symbol runs.
std::vector<std::string> pre_tokenize(const std::string& text_in) {
  std::string text;
  text.reserve(text_in.size());
  for (char c : text_in) text.push_back(tolower(static_cast<unsigned char>(c)));

  std::vector<std::string> out;
  size_t i = 0, n = text.size();
  static const char* contractions[] = {"'s", "'t", "'re", "'ve", "'m", "'ll", "'d"};
  while (i < n) {
    unsigned char c = text[i];
    if (is_space_c(c)) { ++i; continue; }
    if (c == '\'') {
      bool matched = false;
      for (const char* ct : contractions) {
        size_t l = strlen(ct);
        if (text.compare(i, l, ct) == 0) {
          out.emplace_back(text.substr(i, l));
          i += l;
          matched = true;
          break;
        }
      }
      if (matched) continue;
    }
    if (is_letter(c) || (c & 0x80)) {  // letters incl. multibyte runs
      size_t j = i;
      while (j < n && (is_letter(static_cast<unsigned char>(text[j])) || (text[j] & 0x80)))
        ++j;
      out.emplace_back(text.substr(i, j - i));
      i = j;
    } else if (is_digit_c(c)) {
      out.emplace_back(1, text[i]);  // CLIP regex: \p{N} single digits
      ++i;
    } else {
      size_t j = i;
      while (j < n && !is_space_c(static_cast<unsigned char>(text[j])) &&
             !is_letter(static_cast<unsigned char>(text[j])) &&
             !is_digit_c(static_cast<unsigned char>(text[j])) && !(text[j] & 0x80))
        ++j;
      out.emplace_back(text.substr(i, j - i));
      i = j;
    }
  }
  return out;
}

}  // namespace

extern "C" {

void* clip_bpe_new(const char* vocab_path, const char* merges_path,
                   int bos_id, int eos_id, int pad_id) {
  auto* t = new Tokenizer();
  build_byte_encoder(t);

  std::ifstream vf(vocab_path);
  if (!vf) { delete t; return nullptr; }
  std::stringstream vs;
  vs << vf.rdbuf();
  if (!parse_vocab(vs.str(), t)) { delete t; return nullptr; }

  std::ifstream mf(merges_path);
  if (!mf) { delete t; return nullptr; }
  std::string line;
  int rank = 0;
  bool first = true;
  while (std::getline(mf, line)) {
    if (first && line.rfind("#version", 0) == 0) { first = false; continue; }
    first = false;
    if (line.empty()) continue;
    auto sp = line.find(' ');
    if (sp == std::string::npos) continue;
    t->ranks[{line.substr(0, sp), line.substr(sp + 1)}] = rank++;
  }
  t->bos_id = bos_id;
  t->eos_id = eos_id;
  t->pad_id = pad_id;
  return t;
}

void clip_bpe_free(void* handle) { delete static_cast<Tokenizer*>(handle); }

// Encode one text into out[max_len]; returns number of real tokens (<= max_len).
int clip_bpe_encode(void* handle, const char* text, int32_t* out, int max_len) {
  auto* t = static_cast<Tokenizer*>(handle);
  std::vector<int> ids;
  ids.push_back(t->bos_id);
  for (const std::string& tok : pre_tokenize(text)) {
    std::string enc;
    for (unsigned char b : tok) enc += t->byte_enc[b];
    for (const std::string& piece : bpe(*t, enc)) {
      auto it = t->vocab.find(piece);
      if (it != t->vocab.end()) ids.push_back(it->second);
    }
    if (static_cast<int>(ids.size()) >= max_len - 1) break;
  }
  if (static_cast<int>(ids.size()) > max_len - 1) ids.resize(max_len - 1);
  ids.push_back(t->eos_id);
  int n = static_cast<int>(ids.size());
  for (int i = 0; i < max_len; ++i) out[i] = i < n ? ids[i] : t->pad_id;
  return n;
}

// Batch encode with OpenMP-free simple threading handled by caller.
void clip_bpe_encode_batch(void* handle, const char** texts, int count,
                           int32_t* out, int max_len) {
  for (int i = 0; i < count; ++i)
    clip_bpe_encode(handle, texts[i], out + static_cast<int64_t>(i) * max_len, max_len);
}

}  // extern "C"
