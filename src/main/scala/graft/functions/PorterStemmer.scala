package graft.functions

/** The Porter (1980) stemming algorithm — a faithful port of the
  * author's reference implementation (porter.c, retaining its two
  * documented departures from the paper: step-2 `bli`→`ble` instead of
  * `abli`→`able`, and the added `logi`→`log`). This is the algorithm
  * behind Presto's word_stem (via Lucene's PorterStemmer, itself a port
  * of porter.c) and DuckDB's stem(w, 'porter') (via Snowball's porter),
  * which is what lets the oracle entry check the two independent
  * implementations against each other.
  *
  * Operates on lowercase ASCII words; inputs shorter than 3 characters
  * are returned unchanged, as in the original.
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length < 3) return word
    new Run(word.toCharArray).result()
  }

  // One mutable pass over the word buffer; b(0..k) is the live word,
  // j marks the candidate stem end during suffix tests.
  private final class Run(b: Array[Char]) {
    private var k = b.length - 1
    private var j = 0

    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !cons(i - 1)
      case _ => true
    }

    /** Number of consonant sequences in b(0..j) — Porter's m(). */
    private def m(): Int = {
      var n = 0
      var i = 0
      while (i <= j && cons(i)) i += 1
      if (i > j) return n
      i += 1
      while (true) {
        while (i <= j && !cons(i)) i += 1
        if (i > j) return n
        i += 1
        n += 1
        while (i <= j && cons(i)) i += 1
        if (i > j) return n
        i += 1
      }
      n
    }

    private def vowelInStem(): Boolean = (0 to j).exists(i => !cons(i))

    private def doubleC(jj: Int): Boolean =
      jj >= 1 && b(jj) == b(jj - 1) && cons(jj)

    /** consonant–vowel–consonant ending at i, final consonant not w/x/y. */
    private def cvc(i: Int): Boolean = {
      if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) return false
      b(i) match {
        case 'w' | 'x' | 'y' => false
        case _ => true
      }
    }

    private def ends(s: String): Boolean = {
      val len = s.length
      if (len > k + 1) return false
      var i = 0
      while (i < len) {
        if (b(k - len + 1 + i) != s.charAt(i)) return false
        i += 1
      }
      j = k - len
      true
    }

    private def setTo(s: String): Unit = {
      var i = 0
      while (i < s.length) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + s.length
    }

    private def r(s: String): Unit = if (m() > 0) setTo(s)

    private def step1ab(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setTo("i")
        else if (k >= 1 && b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) { if (m() > 0) k -= 1 }
      else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setTo("ate")
        else if (ends("bl")) setTo("ble")
        else if (ends("iz")) setTo("ize")
        else if (doubleC(k)) {
          k -= 1
          b(k) match { case 'l' | 's' | 'z' => k += 1; case _ => }
        }
        else if (m() == 1 && cvc(k)) setTo("e")
      }
    }

    private def step1c(): Unit =
      if (ends("y") && vowelInStem()) b(k) = 'i'

    private def step2(): Unit = {
      if (k < 1) return
      b(k - 1) match {
        case 'a' =>
          if (ends("ational")) r("ate")
          else if (ends("tional")) r("tion")
        case 'c' =>
          if (ends("enci")) r("ence")
          else if (ends("anci")) r("ance")
        case 'e' =>
          if (ends("izer")) r("ize")
        case 'l' =>
          if (ends("bli")) r("ble") // DEPARTURE (paper: abli→able)
          else if (ends("alli")) r("al")
          else if (ends("entli")) r("ent")
          else if (ends("eli")) r("e")
          else if (ends("ousli")) r("ous")
        case 'o' =>
          if (ends("ization")) r("ize")
          else if (ends("ation")) r("ate")
          else if (ends("ator")) r("ate")
        case 's' =>
          if (ends("alism")) r("al")
          else if (ends("iveness")) r("ive")
          else if (ends("fulness")) r("ful")
          else if (ends("ousness")) r("ous")
        case 't' =>
          if (ends("aliti")) r("al")
          else if (ends("iviti")) r("ive")
          else if (ends("biliti")) r("ble")
        case 'g' =>
          if (ends("logi")) r("log") // DEPARTURE (added by the author)
        case _ =>
      }
    }

    private def step3(): Unit = {
      b(k) match {
        case 'e' =>
          if (ends("icate")) r("ic")
          else if (ends("ative")) r("")
          else if (ends("alize")) r("al")
        case 'i' =>
          if (ends("iciti")) r("ic")
        case 'l' =>
          if (ends("ical")) r("ic")
          else if (ends("ful")) r("")
        case 's' =>
          if (ends("ness")) r("")
        case _ =>
      }
    }

    private def step4(): Unit = {
      if (k < 1) return
      val matched = b(k - 1) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' =>
          (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) || ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _ => false
      }
      if (matched && m() > 1) k = j
    }

    private def step5(): Unit = {
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      if (b(k) == 'l' && doubleC(k) && m() > 1) k -= 1
    }

    def result(): String = {
      step1ab(); step1c(); step2(); step3(); step4(); step5()
      new String(b, 0, k + 1)
    }
  }
}
