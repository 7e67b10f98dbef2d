package graft.functions

import java.text.Normalizer

/** Unicode normalization for corpus cleaning — the first transform of
  * every LLM text pipeline (NFKC-fold fullwidth/ligature/compatibility
  * variants so downstream tokenizers and hash-based dedup see one spelling
  * per grapheme; decomposed accents otherwise defeat exact and MinHash
  * dedup because "é" and "e+◌́" shingle differently).
  *
  * Pure static wrappers over `java.text.Normalizer` so the Catalyst
  * expression's `doGenCode` can emit a single static invoke and stay
  * inside whole-stage codegen ([[StaticCallUnary]]).
  */
object Unicodes {
  def nfc(s: String): String = Normalizer.normalize(s, Normalizer.Form.NFC)
  def nfd(s: String): String = Normalizer.normalize(s, Normalizer.Form.NFD)
  def nfkc(s: String): String = Normalizer.normalize(s, Normalizer.Form.NFKC)
  def nfkd(s: String): String = Normalizer.normalize(s, Normalizer.Form.NFKD)
}
