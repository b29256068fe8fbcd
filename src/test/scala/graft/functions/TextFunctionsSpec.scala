package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("v")).collect().head.getAs[T]("v")

  test("tokenCount counts alphanumeric runs") {
    assert(one[Int](TextFunctions.tokenCount($"t"), "Hello, world! 42") === 3)
    assert(one[Int](TextFunctions.tokenCount($"t"), "") === 0)
    assert(one[Int](TextFunctions.tokenCount($"t"), "...!!!") === 0)
  }

  test("tokenCountBpe counts letter runs, digit runs, and punctuation separately") {
    // "ab12,cd" → ab | 12 | , | cd
    assert(one[Int](TextFunctions.tokenCountBpe($"t"), "ab12,cd") === 4)
  }

  test("punct/digit/upper counts") {
    assert(one[Int](TextFunctions.punctCount($"t"), "a,b.c!?") === 4)
    assert(one[Int](TextFunctions.digitCount($"t"), "a1b22c") === 3)
    assert(one[Int](TextFunctions.upperCount($"t"), "AbCd") === 2)
  }

  test("avgTokenLen is mean token length, 0 for token-free text") {
    assert(one[Double](TextFunctions.avgTokenLen($"t"), "ab abcd") === 3.0)
    assert(one[Double](TextFunctions.avgTokenLen($"t"), "!!") === 0.0)
  }

  test("qualityScore is in [0,1], higher for prose than for junk") {
    val prose = "The quick brown fox jumps over the lazy dog and runs to the forest with a friend. " * 5
    val junk = "3485 2384 91 1 3 3333 77 12, 9, 1!!!"
    val qp = one[Double](TextFunctions.qualityScore($"t"), prose)
    val qj = one[Double](TextFunctions.qualityScore($"t"), junk)
    assert(qp > qj)
    assert(qp >= 0.0 && qp <= 1.0 && qj >= 0.0 && qj <= 1.0)
  }

  test("qualityScore counts capitalized stopwords (The/A at sentence start)") {
    // identical text modulo case must score identically
    val a = one[Double](TextFunctions.qualityScore($"t"), "The cat sat on the mat.")
    val b = one[Double](TextFunctions.qualityScore($"t"), "the cat sat on the mat.")
    assert(a === b)
  }

  test("langId identifies clear-cut sentences; und when nothing hits") {
    val cases = Seq(
      "the cat is on the mat and it is happy" -> "en",
      "der Hund ist nicht zu Hause und ich bin mit dem Auto" -> "de",
      "el perro es muy grande y la casa es de un amigo" -> "es",
      "le chien est dans la maison et il est avec nous" -> "fr",
      "我 是 他 的 朋友 他 有 不 一样 的 想法" -> "zh",
      "я не знаю что он сказал но это было смешно" -> "ru",
      "ele foi para casa porque estava muito cansado depois do trabalho" -> "pt",
      "sono andato alla stazione con il treno di mattina" -> "it",
      "彼は本を読んでいた" -> "ja",
      "아이들은 학교가 쉬는 날이라 거리에서 놀고 있다" -> "ko",
      "zzz qqq xxx" -> "und",
      "" -> "und")
    cases.foreach { case (text, expected) =>
      assert(one[String](TextFunctions.langId($"t"), text) === expected, s"for: $text")
    }
  }

  test("native stopwordCount matches the regex/HOF pipeline") {
    // TokensInSetCount replaced size(filter(tokens, array_contains))
    // for codegen; this pins the equivalence on representative text
    // (ASCII corpus shapes + case folding + token breaks).
    val texts = Seq(
      "The quick brown fox jumps over the lazy dog",
      "THE AND OF to In THAT", "a an and", "", "no stop words here!!",
      "the,and;of:to.in", "42 the 99 and", "café the naïve and",
      "x" * 5000 + " the and")
    val df = texts.toDF("t")
    val hof = df.select(size(filter(
      regexp_extract_all(lower($"t"), lit("[A-Za-z0-9]+"), lit(0)),
      tk => array_contains(lit(TextFunctions.enStopwordList.toArray), tk))).as("v"))
      .collect().map(_.getInt(0)).toSeq
    val native = df.select(TextFunctions.stopwordCount($"t").as("v"))
      .collect().map(_.getInt(0)).toSeq
    assert(native === hof)
  }

  test("native scan matches the regex pipeline on random multi-script text (property)") {
    // Property form of the fixed-string test above: random strings
    // over the token grammar's full contract alphabet — ASCII
    // upper/lower/digits, Cyrillic upper/lower (fold targets), CJK /
    // kana / hangul singles, accented-Latin token BREAKS, punctuation
    // and range-boundary chars — with real stopwords and language
    // markers spliced in so hit counts are non-trivial. Pins BOTH
    // native expressions (TokensInSetCount, LangIdOf) to their
    // regex/relational reference forms. Excluded by design: exotic
    // codepoints whose full-Unicode lowercase enters a token class
    // (U+212A KELVIN, U+0130 İ) — the documented divergence.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val fragment: Gen[String] = Gen.frequency(
      6 -> Gen.listOfN(4, Gen.frequency[Char](
        6 -> Gen.alphaChar,
        2 -> Gen.numChar,
        3 -> Gen.choose(0x0410.toChar, 0x044F.toChar), // Cyrillic А-я
        1 -> Gen.oneOf('Ё', 'ё'),
        2 -> Gen.choose(0x4E00.toChar, 0x4E40.toChar), // CJK sample
        1 -> Gen.choose(0x3041.toChar, 0x30FE.toChar), // kana
        1 -> Gen.choose(0xAC00.toChar, 0xAC40.toChar), // hangul
        1 -> Gen.oneOf('é', 'ü', 'ñ', 'ß', 'ç'), // breaks in both
        1 -> Gen.oneOf('@', '[', '`', '{', '~', '0' - 1, '9' + 1))).map(_.mkString),
      3 -> Gen.oneOf(TextFunctions.enStopwordList),
      3 -> Gen.oneOf(TextFunctions.langMarkers.flatMap(_._2)),
      1 -> Gen.const(""))
    val sep = Gen.oneOf(" ", "", ", ", "\n", "\t", "。", " - ")
    val genText: Gen[String] = for {
      n <- Gen.choose(0, 12)
      frags <- Gen.listOfN(n, fragment)
      seps <- Gen.listOfN(n, sep)
    } yield frags.zip(seps).map { case (f, s) => f + s }.mkString
    val texts = Gen.listOfN(400, genText)
      .pureApply(Gen.Parameters.default, Seed(42L))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val regexForm = df.select($"doc_id", size(filter(
      TextFunctions.tokensLower($"text"),
      tk => array_contains(lit(TextFunctions.enStopwordList.toArray), tk))).as("hof"))
    val nativeForm = df.select($"doc_id",
      TextFunctions.stopwordCount($"text").as("native"),
      TextFunctions.langId($"text").as("lang_native"))
    val relational = graft.operators.TextAnalysis.langId(df)
      .withColumnRenamed("lang_id", "lang_rel")
    nativeForm.join(regexForm, "doc_id").join(relational, "doc_id")
      .collect().foreach { r =>
        val id = r.getAs[Long]("doc_id").toInt
        assert(r.getAs[Int]("native") === r.getAs[Int]("hof"),
          s"stopword count divergence on: '${texts(id)}'")
        assert(r.getAs[String]("lang_native") === r.getAs[String]("lang_rel"),
          s"langId divergence on: '${texts(id)}'")
      }
  }

  test("langId accuracy >= 90% on a labeled sentence fixture (non-circular evaluation)") {
    // The doc_lang oracle re-implements the same marker algorithm, so
    // its green row proves consistency, not accuracy. This fixture is
    // labeled by LANGUAGE, not by the algorithm — natural sentences a
    // human would tag — so it actually grades the classifier.
    val labeled: Seq[(String, String)] = Seq(
      "en" -> "The children were playing in the garden when it started to rain.",
      "en" -> "She said that they would have to leave for the station at noon.",
      "en" -> "He was not sure which of the books you wanted from the library.",
      "en" -> "They are planning to visit an old friend who lives by the sea.",
      "en" -> "It is hard to say what the weather will be like on Sunday.",
      "en" -> "The report was written by a committee and published on Friday.",
      "en" -> "You should have seen the look on his face at the meeting.",
      "en" -> "There was nothing in the box but an old photograph and a key.",
      "en" -> "We knew that the road to the village was closed for repairs.",
      "en" -> "From the top of the hill you can see the whole valley.",
      "de" -> "Der Hund läuft durch den Garten und bellt die Katze an.",
      "de" -> "Ich habe nicht gewusst, dass sie schon nach Hause gegangen ist.",
      "de" -> "Das Wetter wird morgen besser, sagte er mit einem Lächeln.",
      "de" -> "Die Kinder spielen auf der Straße, weil die Schule geschlossen ist.",
      "de" -> "Er hat mir ein Buch aus der Bibliothek mitgebracht.",
      "de" -> "Wir werden uns am Bahnhof treffen, wenn der Zug ankommt.",
      "de" -> "Sie wollte wissen, warum das Fenster offen war.",
      "de" -> "Aus dem Bericht geht hervor, dass die Kosten gestiegen sind.",
      "de" -> "Am Abend war es im Dorf ganz still und dunkel.",
      "de" -> "Der alte Mann saß auf der Bank und las eine Zeitung.",
      "es" -> "El perro corre por el jardín y ladra a los gatos.",
      "es" -> "No sabía que ella ya se había ido a su casa.",
      "es" -> "Los niños juegan en la calle porque no hay clases hoy.",
      "es" -> "El tiempo va a mejorar mañana, dijo con una sonrisa.",
      "es" -> "Me trajo un libro de la biblioteca para el verano.",
      "es" -> "Nos vemos en la estación cuando llegue el tren de Madrid.",
      "es" -> "Ella quería saber por qué la ventana estaba abierta.",
      "es" -> "Del informe se desprende que los costos han subido mucho.",
      "es" -> "Por la noche el pueblo estaba muy tranquilo y oscuro.",
      "es" -> "El viejo estaba sentado en el banco leyendo un periódico.",
      "fr" -> "Le chien court dans le jardin et aboie sur les chats.",
      "fr" -> "Je ne savais pas qu'elle était déjà rentrée chez elle.",
      "fr" -> "Les enfants jouent dans la rue parce que l'école est fermée.",
      "fr" -> "Le temps va s'améliorer demain, dit-il avec un sourire.",
      "fr" -> "Il m'a apporté un livre de la bibliothèque pour l'été.",
      "fr" -> "Nous nous verrons à la gare quand le train arrivera.",
      "fr" -> "Elle voulait savoir pourquoi la fenêtre était ouverte.",
      "fr" -> "Le rapport montre que les coûts ont beaucoup augmenté.",
      "fr" -> "Le soir, le village était calme et il ne se passait rien.",
      "fr" -> "Le vieil homme était assis sur le banc avec son journal.",
      "zh" -> "我今天要去学校，因为有一个很重要的考试。",
      "zh" -> "他说他不知道你已经回家了。",
      "zh" -> "孩子们在街上玩，因为学校今天不上课。",
      "zh" -> "明天的天气会更好，他笑着说。",
      "zh" -> "他给我带来了一本图书馆的书。",
      "zh" -> "火车到的时候我们在车站见面。",
      "zh" -> "她想知道窗户为什么是开着的。",
      "zh" -> "报告说成本已经涨了很多。",
      "zh" -> "晚上的村子很安静，也很黑。",
      "zh" -> "老人坐在长椅上看报纸。",
      "ru" -> "Я не знаю, что он сказал на собрании.",
      "ru" -> "Мы были в городе, но она осталась дома.",
      "ru" -> "Это было так давно, что никто не помнит.",
      "ru" -> "Он взял книгу из библиотеки для своего брата.",
      "ru" -> "Вы же сказали, что у вас есть время.",
      "ru" -> "Дети играют на улице, потому что в школе каникулы.",
      "ru" -> "Она сказала, что это был его дом.",
      "ru" -> "Из отчета видно, что расходы выросли за год.",
      "ru" -> "Мы с ним так и не поговорили о работе.",
      "ru" -> "Поезд приходит утром, и мы встретим его на вокзале.",
      "pt" -> "Ele foi para casa porque estava muito cansado depois do trabalho.",
      "pt" -> "Os meninos estavam brincando na rua quando começou a chover.",
      "pt" -> "Ela disse que vai viajar com os amigos em janeiro.",
      "pt" -> "O relatório mostra que os custos aumentaram muito este ano.",
      "pt" -> "Nós vamos nos encontrar na estação quando o trem chegar.",
      "pt" -> "Ele trouxe um livro da biblioteca para o verão.",
      "pt" -> "Foi uma noite muito tranquila na aldeia depois da festa.",
      "pt" -> "As crianças gostam de brincar no jardim depois das aulas.",
      "pt" -> "Isso aconteceu há muitos anos, quando ele era jovem.",
      "pt" -> "Muito obrigado por tudo o que você fez.",
      "it" -> "Il cane corre nel giardino e abbaia ai gatti.",
      "it" -> "Non sapevo che lei fosse già tornata a casa.",
      "it" -> "I bambini giocano nel cortile della scuola dopo le lezioni.",
      "it" -> "Questo libro è molto interessante e anche facile da leggere.",
      "it" -> "Sono andato alla stazione con il treno di mattina.",
      "it" -> "Il vecchio era seduto sulla panchina a leggere il giornale.",
      "it" -> "Non hanno capito quello che il professore ha detto.",
      "it" -> "La casa dei nonni si trova vicino al mare.",
      "it" -> "Dopo cena siamo andati a fare due passi nel parco con il cane.",
      "it" -> "Anche questo problema sarà risolto quando avremo i dati.",
      "ja" -> "私は学校に行きます。",
      "ja" -> "彼は本を読んでいた。",
      "ja" -> "子供たちは学校が休みなので外で遊んでいる。",
      "ja" -> "明日の天気はもっと良くなると彼は言った。",
      "ja" -> "彼女は窓がなぜ開いているのか知りたかった。",
      "ja" -> "電車が着いたとき、私たちは駅で会いました。",
      "ja" -> "報告書によるとコストが大幅に上がっている。",
      "ja" -> "夜になると村はとても静かで暗かった。",
      "ja" -> "老人はベンチに座って新聞を読んでいた。",
      "ja" -> "図書館から本を借りてきてくれました。",
      "ko" -> "아이들은 학교가 쉬는 날이라 거리에서 놀고 있다.",
      "ko" -> "그는 그녀가 이미 집에 갔다는 것을 몰랐다.",
      "ko" -> "내일은 날씨가 더 좋아질 것이라고 그가 말했다.",
      "ko" -> "그녀는 창문이 왜 열려 있는지 알고 싶어했다.",
      "ko" -> "보고서에 따르면 비용이 많이 올랐다고 한다.",
      "ko" -> "저녁이 되자 마을은 아주 조용하고 어두웠다.",
      "ko" -> "노인은 벤치에 앉아서 신문을 읽고 있었다.",
      "ko" -> "기차가 도착했을 때 우리는 역에서 만났다.",
      "ko" -> "그는 도서관에서 책 한 권을 빌려 왔다.",
      "ko" -> "우리는 바다 근처에 사는 오랜 친구를 방문할 계획이다.")
    val scored = labeled.toDF("expected", "t")
      .withColumn("got", TextFunctions.langId($"t"))
    val perLang = scored
      .groupBy($"expected")
      .agg(avg(when($"got" === $"expected", 1.0).otherwise(0.0)).as("acc"))
      .as[(String, Double)].collect().toMap
    val overall = scored
      .agg(avg(when($"got" === $"expected", 1.0).otherwise(0.0)))
      .as[Double].collect().head
    assert(overall >= 0.9, s"overall accuracy $overall; per-language: $perLang")
    perLang.foreach { case (lang, acc) =>
      assert(acc >= 0.8, s"$lang accuracy $acc; per-language: $perLang")
    }
  }

  test("native langId agrees with the relational broadcast-join form on every fixture sentence") {
    // Two independent implementations of the same marker algorithm:
    // LangIdOf (native byte-scan tokenizer) and TextAnalysis.langId
    // (regex tokensLower + explode + broadcast join). The DuckDB
    // oracle checks only the relational form; this pins the native
    // form to it across all 10 languages' scripts (ASCII, Cyrillic,
    // CJK, kana, hangul) so the two tokenizers cannot drift apart.
    val sentences = Seq(
      "The children were playing in the garden when it started to rain.",
      "Der Hund läuft durch den Garten und bellt die Katze an.",
      "El perro corre por el jardín y ladra a los gatos.",
      "Le chien court dans le jardin et aboie sur les chats.",
      "我今天要去学校，因为有一个很重要的考试。",
      "Я не знаю, что он сказал на собрании.",
      "Ele foi para casa porque estava muito cansado depois do trabalho.",
      "Il cane corre nel giardino e abbaia ai gatti.",
      "彼は本を読んでいた。",
      "아이들은 학교가 쉬는 날이라 거리에서 놀고 있다.",
      "zzz qqq xxx", "", "42 999 13", "mixed 的 text и 이 bag こ")
    val df = sentences.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = df.select($"doc_id", TextFunctions.langId($"text").as("lang_native"))
    val relational = graft.operators.TextAnalysis.langId(df)
      .withColumnRenamed("lang_id", "lang_rel")
    val joined = native.join(relational, "doc_id")
      .select($"doc_id", $"lang_native", $"lang_rel").collect()
    joined.foreach { r =>
      assert(r.getAs[String]("lang_native") === r.getAs[String]("lang_rel"),
        s"divergence on doc ${r.getAs[Long]("doc_id")}: ${sentences(r.getAs[Long]("doc_id").toInt)}")
    }
  }

  test("fingerprint is normalization-invariant (case, punctuation, whitespace)") {
    val f1 = one[String](TextFunctions.fingerprintMd5($"t"), "Hello,   World!")
    val f2 = one[String](TextFunctions.fingerprintMd5($"t"), "hello world")
    val f3 = one[String](TextFunctions.fingerprintMd5($"t"), "hello there")
    assert(f1 === f2)
    assert(f1 !== f3)
    val x1 = one[Long](TextFunctions.fingerprint64($"t"), "Hello,   World!")
    val x2 = one[Long](TextFunctions.fingerprint64($"t"), "hello world")
    assert(x1 === x2)
  }

  test("native scan tokenizes malformed UTF-8 like Java's REPLACE decoder (property)") {
    // Spark does not validate UTF-8 on parquet read, so crawl text
    // can carry broken bytes. The scan must resynchronize exactly
    // like the relational path (lower()+regex over the REPLACE-
    // decoded string): an invalid lead never swallows a following
    // token byte (e.g. 0xC2 0x61 keeps the 'a').
    import org.apache.spark.sql.graft.TextTokens
    import org.apache.spark.unsafe.types.UTF8String
    val pat = java.util.regex.Pattern.compile(TextTokens.TokenPattern)
    def foldCp(cp: Int): Int = // mirror of the scan's lowerCp
      if (cp >= 'A' && cp <= 'Z') cp + 32
      else if (cp >= 0x0410 && cp <= 0x042F) cp + 0x20
      else if (cp == 0x0401) 0x0451
      else cp
    def reference(bytes: Array[Byte]): Seq[Long] = {
      val decoded = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      val folded = decoded.codePoints().map(foldCp(_))
        .collect(() => new java.lang.StringBuilder,
          (b: java.lang.StringBuilder, cp: Int) => b.appendCodePoint(cp),
          (a: java.lang.StringBuilder, b: java.lang.StringBuilder) => { a.append(b); () })
        .toString
      val m = pat.matcher(folded)
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      while (m.find()) out += TextTokens.hashWord(m.group())
      out.toSeq
    }
    def scanned(bytes: Array[Byte]): Seq[Long] = {
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      TextTokens.scan(UTF8String.fromBytes(bytes),
        new TextTokens.Sink { def token(h: Long): Unit = out += h })
      out.toSeq
    }
    // the review's exact case first
    assert(scanned(Array(0xC2.toByte, 'a'.toByte)) === reference(Array(0xC2.toByte, 'a'.toByte)))
    val rnd = new scala.util.Random(13)
    val words = Seq("the", "and", "für", "данные", "の", "X9")
    for (_ <- 0 until 500) {
      val bb = scala.collection.mutable.ArrayBuffer[Byte]()
      for (_ <- 0 until (1 + rnd.nextInt(8))) {
        rnd.nextInt(3) match {
          case 0 => bb ++= words(rnd.nextInt(words.size)).getBytes("UTF-8")
          case 1 => bb ++= Array.fill(1 + rnd.nextInt(4))((rnd.nextInt(256) - 128).toByte)
          case 2 => bb += ' '.toByte
        }
      }
      val bytes = bb.toArray
      assert(scanned(bytes) === reference(bytes),
        s"diverged on bytes ${bytes.map(b => f"${b & 0xff}%02x").mkString(" ")}")
    }
  }
}
