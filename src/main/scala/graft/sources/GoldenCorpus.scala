package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic golden fixture corpus (FIXTURES.md §1 `small` tier).
  *
  * Every document is a pure function of its index (per-doc seeded PRNG, no
  * global RNG state), so the corpus is identical across JVMs, partitionings
  * and runs — the precondition for the committed golden labels the F1 gate
  * compares against (BASELINE.md: keep/drop F1 >= 0.99, byte-identical
  * scrubbed text per url).
  *
  * Document classes (cycled by index):
  *  - clean prose in each of the 5 seed languages, varying length
  *  - too-short docs                       (min_doc_length)
  *  - symbol soup                          (max_symbol_word_ratio)
  *  - keyword-stuffing spam                (max_word_repetition)
  *  - duplicated-line boilerplate          (max_dup_line_fraction)
  *  - empty / whitespace-only
  *  - PII-laced prose (emails/phones/IPs/SSNs/CCs) for scrub byte-identity
  *  - multi-byte UTF-8 + surrogate-pair content
  *  - (idx >= 240) web-junk: nav-menu boilerplate, code blocks
  *  - (idx >= 280) clean prose in the round-3 depth languages
  *    (it/pt/nl/ru/ja — two extra scripts)
  *  - (idx >= 330) clean prose in the round-4 depth languages
  *    (pl/ko — one more script)
  *  - (idx >= 370) clean prose in the round-5 depth languages
  *    (sv/tr/id/vi/ar/hi — two more scripts: Arabic, Devanagari)
  */
object GoldenCorpus {

  private val langs = Array("en", "es", "fr", "de", "zh")

  /** Round-3 langid depth languages: fixture classes appended past index
    * 280 so every earlier document (and its committed label) stays
    * byte-stable.
    */
  private val extraLangs = Array("it", "pt", "nl", "ru", "ja")

  /** Round-4 depth languages, appended past index 330 — same byte-stable
    * append discipline.
    */
  private val extraLangs2 = Array("pl", "ko")

  /** Round-5 depth languages, appended past index 370 (two more scripts:
    * Arabic, Devanagari) — same byte-stable append discipline.
    */
  private val extraLangs3 = Array("sv", "tr", "id", "vi", "ar", "hi")

  /** Thai, appended past index 430 (Thai script; segmented-corpus shape
    * like zh — real Thai writes without inter-word spaces).
    */
  private val extraLangs4 = Array("th")

  /** Round-6 block, appended past index 440: UNSEGMENTED zh/ja/th — the
    * shape real Common-Crawl pages in no-space scripts actually have (no
    * fixture pre-segmentation). Clean prose must be KEPT by the
    * script-adaptive rules; every 10th document in the block is
    * unsegmented keyword stuffing that repetition_adaptive must DROP.
    */
  private val extraLangs5 = Array("zh", "ja", "th")

  /** FROZEN fixture vocabularies — a snapshot of the LangId seed corpora
    * as of round 3, deliberately NOT a reference to LangId.seeds: the
    * model's seeds may be enriched as the scorer deepens, and model
    * tuning must never rewrite the fixture corpus the committed golden
    * labels describe (text here is part of the golden contract — scrub
    * md5s are byte-pinned per url).
    */
  private val vocab: Map[String, String] = Map(
    "en" -> ("the be to of and a in that have it for not on with he as you " +
      "do at this but his by from they we say her she or an will my one all " +
      "would there their what so up out if about who get which go me when " +
      "make can like time no just him know take people into year your good " +
      "some could them see other than then now look only come its over think " +
      "also back after use two how our work first well way even new want " +
      "because any these give day most us is was are been has had were said"),
    "es" -> ("de la que el en y a los del se las por un para con no una su " +
      "al lo como más pero sus le ya o este sí porque esta entre cuando muy " +
      "sin sobre también me hasta hay donde quien desde todo nos durante " +
      "todos uno les ni contra otros ese eso ante ellos e esto mí antes " +
      "algunos qué unos yo otro otras otra él tanto esa estos mucho quienes " +
      "nada muchos cual poco ella estar estas algunas algo nosotros"),
    "fr" -> ("de la le et les des en un du une que est pour qui dans a par " +
      "plus pas au sur ne se ce il sont la aux avec son ont cette mais ou où " +
      "leur elle si tout comme nous sa ses mais été sont être avoir fait " +
      "faire peut tous après autre bien deux même notre ans entre sans elle " +
      "très votre aussi celui dont leurs moins ceux eux quelques toutes " +
      "toujours alors depuis donc quand encore vers chez quel quelle"),
    "de" -> ("der die und in den von zu das mit sich des auf für ist im dem " +
      "nicht ein eine als auch es an werden aus er hat dass sie nach wird " +
      "bei einer um am sind noch wie einem über einen so zum war haben nur " +
      "oder aber vor zur bis mehr durch man sein wurde sei während zwischen " +
      "immer wieder gegen vom ganz einzelnen wo muss ohne eines können sehr " +
      "schon wenn hier alle diese seinem wäre ihren jahre mich"),
    "zh" -> ("的一是在不了有和人这中大为上个国我以要他时来用们生到作地" +
      "于出就分对成会可主发年动同工也能下过子说产种面而方后多定行学法" +
      "所民得经十三之进着等部度家电力里如水化高自二理起小物现实加量都" +
      "两体制机当使点从业本去把性好应开它 我们的 他们在 一个人 这是一" +
      "个 大的国家 在学校 中文和 学习的 他们的 我们在 是一个 有一个"),
    "it" -> ("di e il la che in a per un è non sono una con si da come le " +
      "dei più nel alla ma lo se gli anche della questo sua suo loro ha " +
      "hanno essere fare del i al negli sulla questi molto dove quando " +
      "perché cosa tutti tutto ancora dopo prima senza sotto sopra tra fra " +
      "può deve stato erano era così ogni altri altre quale quali mentre " +
      "contro già sempre qui oggi anni anno casa vita tempo uomo parte " +
      "mondo giorno modo città paese stesso quella quelle nella delle " +
      "sono stati essere aveva fatto grande nuovo primo due tre volta"),
    "pt" -> ("de a o que e do da em um para é com não uma os no se na por " +
      "mais as dos como mas foi ao ele das tem à seu sua ou ser quando " +
      "muito há nos já está eu também só pelo pela até isso ela entre era " +
      "depois sem mesmo aos ter seus quem nas me esse eles estão você " +
      "tinha foram essa num nem suas meu às minha têm numa pelos elas " +
      "havia seja qual será nós tenho lhe deles essas esses pelas este " +
      "fosse dele anos ano casa vida tempo homem parte mundo dia modo"),
    "nl" -> ("de het een en van in is dat op te zijn voor met als niet aan " +
      "er om door maar dan ook bij nog naar uit dit over hij wordt worden " +
      "werd wel kan moet heeft hebben had geen meer al toen onder tussen " +
      "tegen deze die ze we ik je hun na mijn zou kunnen veel waar hoe wat " +
      "wie alle andere twee eerste nieuwe grote tijd jaar mensen werk land " +
      "werden omdat zelf tot haar hem ons onze jullie zij iets niets " +
      "alleen steeds altijd samen tijdens volgens vooral echter daarom"),
    "ru" -> ("и в не на я что он с как это она по но они к у из за то все " +
      "мы о так же бы был от для вот кто да его ему ни теперь когда уже " +
      "если или него вы меня есть нет ещё только себя своей было были " +
      "быть может очень при мне ей чем чтобы раз тоже себе под будет " +
      "потом нас ним где даже ведь там здесь этот тот наш один два три " +
      "человек время жизнь день год рука дело слово место лицо голова " +
      "работа россия город страна мир дом сказал говорит между после"),
    "ja" -> ("の に は を た が で て と し れ さ ある いる も する から " +
      "な こと として い や など なっ ない この ため その あっ よう また " +
      "もの という あり まで られ なる へ か だ これ によって により おり " +
      "より による ず なり られる において ば なかっ なく しかし について " +
      "せ だっ できる それ う ので なお のみ でき き つ における および " +
      "いう さらに でも ら たり ます ん なら に対して 特に せる 及び " +
      "これら とき では にて ほか ながら うち そして とともに ただし " +
      "かつて それぞれ または 日本 年 月 日 人 大きな 小さな 新しい"),
    // round-4 snapshots (same freeze discipline as above)
    "pl" -> ("nie to się w na i z co jest że do tak jak o mnie a ale mi po " +
      "ja za tu ty już tylko jej go tego jestem może pan dla ciebie coś " +
      "tym być ma cię mam was wszystko nic tam więc jeszcze dobrze będzie " +
      "czy gdzie teraz chcę wiem przez ten musi ich nas mój bardzo sobie " +
      "kiedy która które który też przed od przy bez nad pod między " +
      "podczas właśnie można trzeba jednak dlatego ponieważ oraz także " +
      "również innych każdy wszystkich czas dzień świat dom człowiek rok " +
      "ręka praca słowo miejsce miasto kraj woda noc rodzina osoba grupa " +
      "problem punkt godzina dziecko kobieta mężczyzna szkoła państwo"),
    "ko" -> ("이 그 저 것 수 들 등 및 에서 그리고 하지만 그러나 우리 당신 " +
      "사람 시간 생활 세계 하루 집 남자 여자 학교 나라 물 밤 가족 사람들 " +
      "그룹 문제 말 장소 도시 일 년 월 손 머리 마음 때문 위해 대한 통해 " +
      "있는 없는 하는 되는 같은 다른 모든 어떤 이런 그런 한국 서울 오늘 " +
      "내일 어제 지금 여기 거기 무엇 누구 언제 어디 왜 어떻게 은 는 가 " +
      "을 를 에 의 로 와 과 도 만 까지 부터 보다 처럼 에게 한다 했다 " +
      "있다 없다 된다 합니다 있습니다 없습니다 때 곳 말했다 생각 경우"),
    // round-5 snapshots (same freeze discipline as above)
    "sv" -> ("och att det som en på är av för med den till i inte om han " +
      "hon de vi jag du sig men ett har var kan ska skulle från eller när " +
      "vad där så här efter under över mellan också bara mycket alla andra " +
      "några vilket sedan redan kanske därför genom utan hos vid ännu sina " +
      "hade blev vara bli denna detta dessa vilka honom henne dem oss er " +
      "tid liv värld dag hus man år land stad arbete kvinna fall sak form " +
      "regering plats sätt vecka historia vatten natt familj människa hand " +
      "grupp problem ord punkt timme barn skola språk fråga nummer kväll"),
    "tr" -> ("bir ve bu için de da ne gibi ile daha çok o ben sen biz siz " +
      "onlar ama ki mi var yok olan olarak sonra kadar göre her şey en az " +
      "önce şimdi burada nerede nasıl neden çünkü eğer ise değil hem ya " +
      "zaman ancak bütün kendi başka yine böyle şöyle bunu bunun onun " +
      "diye dedi oldu olur olmak etmek yapmak gelmek gitmek görmek almak " +
      "hayat dünya gün ev adam yıl ülke şehir iş kadın durum biçim " +
      "hükümet an yer hafta tarih su gece aile insan el grup sorun " +
      "kelime nokta saat çocuk okul dil soru sayı akşam para öykü ay hak"),
    "id" -> ("yang dan di itu dengan untuk tidak ini dari dalam akan pada " +
      "juga saya kita dia mereka kami anda ada bisa sudah telah harus atau " +
      "tetapi karena jika ketika seperti lebih sangat hanya masih semua " +
      "setiap banyak sedikit antara tanpa sampai sejak oleh agar supaya " +
      "namun bahwa adalah menjadi membuat mengatakan melihat datang pergi " +
      "orang waktu hidup dunia hari rumah tahun negara kota kerja " +
      "perempuan kasus hal bentuk pemerintah saat tempat cara minggu " +
      "sejarah air malam keluarga tangan kelompok masalah kata titik jam " +
      "anak sekolah bahasa pertanyaan nomor sore uang cerita bulan hasil"),
    "vi" -> ("của và là có không được một người trong cho với những này " +
      "khi đã các để tôi anh chị em chúng ta họ bạn rất cũng như thì mà " +
      "lại còn nếu vì sao đây đó nơi từ về sau trước trên dưới giữa ngoài " +
      "bên theo cùng nhưng nên phải sẽ đang bị ra vào lên xuống đến đi " +
      "làm nói thấy biết muốn tìm ở qua khỏi thành bởi rằng điều gì " +
      "thời gian cuộc sống thế giới ngày nhà năm đất nước thành phố công " +
      "việc phụ nữ trường hợp hình thức chính phủ lúc chỗ cách tuần lịch " +
      "sử nước đêm gia đình bàn tay nhóm vấn đề điểm giờ trẻ con trường " +
      "học ngôn ngữ câu hỏi số buổi tối tiền câu chuyện tháng kết quả"),
    "ar" -> ("في من على أن إلى عن مع هذا هذه التي الذي كان كانت هو هي هم " +
      "نحن أنا أنت لا ما لم لن قد كل بعد قبل عند غير بين حتى إذا لكن ثم " +
      "أو كما منذ حيث ذلك تلك هناك هنا عندما لماذا كيف أين متى " +
      "لأن لكي سوف ليس كانوا يكون تكون أكثر أقل جدا فقط أيضا ضد خلال " +
      "وقت حياة عالم يوم بيت رجل سنة بلد مدينة عمل امرأة حالة شكل حكومة " +
      "لحظة مكان طريقة أسبوع تاريخ ماء ليل عائلة إنسان يد مجموعة مشكلة " +
      "كلمة نقطة ساعة طفل مدرسة لغة سؤال رقم مساء مال قصة شهر نتيجة حق"),
    "hi" -> ("के में है और की से का को पर यह कि नहीं एक हैं था थी थे हो " +
      "गया कर रहा रही तो भी जो वह मैं हम आप वे कुछ सब अपने लिए साथ बाद " +
      "पहले अब यहाँ वहाँ कब कैसे क्यों अगर लेकिन फिर या जब तक बहुत ही " +
      "इस उस ये वो कोई किसी मुझे तुम उसे हमें उन्हें मेरा तेरा उसका " +
      "समय जीवन दुनिया दिन घर आदमी साल देश शहर काम औरत मामला चीज़ रूप " +
      "सरकार पल जगह तरीका सप्ताह इतिहास पानी रात परिवार इंसान हाथ समूह " +
      "समस्या शब्द बिंदु घंटा बच्चा स्कूल भाषा सवाल संख्या शाम पैसा " +
      "कहानी महीना नतीजा अधिकार"),
    "th" -> ("ที่ และ ใน ของ มี ไม่ ให้ ได้ ว่า เป็น การ จะ ไป มา กับ แต่ " +
      "ก็ อยู่ คน นี้ นั้น ซึ่ง จาก โดย เมื่อ ถ้า เพราะ หรือ แล้ว ยัง ต้อง " +
      "ถูก เขา เรา ฉัน คุณ มัน พวก ทุก บาง อีก มาก น้อย ดี ใหม่ ใหญ่ เล็ก " +
      "ทำ รู้ เห็น คิด พูด บอก ถาม ตอบ ใช้ หา เอา วัน เวลา ชีวิต โลก " +
      "บ้าน ผู้ชาย ปี ประเทศ เมือง งาน ผู้หญิง กรณี สิ่ง รูปแบบ รัฐบาล " +
      "ขณะ สถานที่ วิธี สัปดาห์ ประวัติ น้ำ คืน ครอบครัว มือ กลุ่ม ปัญหา " +
      "คำ จุด ชั่วโมง เด็ก โรงเรียน ภาษา คำถาม จำนวน เย็น เงิน เรื่อง " +
      "เดือน ผล สิทธิ หัว ใจ ตา")
  )

  private def words(lang: String): Array[String] =
    if (lang == "zh")
      // zh vocab is partly unsegmented: the fixture inventory is its single
      // characters (space-delimited zh text, segmented-corpus shape)
      vocab("zh").replaceAll("\\s", "").toCharArray.map(_.toString).distinct
    else
      vocab(lang).split("\\s+").filter(_.nonEmpty)

  /** One document, deterministically, from its index. Indexes >= 240 are
    * the round-2 web-junk classes (boilerplate nav menus, code blocks) —
    * appended past the original range so the original 240 docs and their
    * committed labels are byte-stable across rounds.
    */
  def doc(i: Int): (String, String, String) = {
    val rnd = new scala.util.Random(i.toLong * 7919 + 42)
    val lang =
      if (i >= 440) extraLangs5((i - 440) % extraLangs5.length)
      else if (i >= 430) extraLangs4((i - 430) % extraLangs4.length)
      else if (i >= 370) extraLangs3((i - 370) % extraLangs3.length)
      else if (i >= 330) extraLangs2((i - 330) % extraLangs2.length)
      else if (i >= 280) extraLangs((i - 280) % extraLangs.length)
      else langs(i % langs.length)
    val ws = words(lang)
    def sentence(n: Int): String =
      (0 until n).map(_ => ws(rnd.nextInt(ws.length))).mkString(" ")
    // unsegmented prose: words joined with NO spaces; zh/ja get 。 every
    // 12 words (CJK full stop — a symbol, like real pages), th gets none
    // (Thai uses no sentence punctuation)
    def unsegmented(n: Int): String = {
      val sep = if (lang == "th") "" else "。"
      (0 until n).map(_ => ws(rnd.nextInt(ws.length)))
        .grouped(12).map(_.mkString("")).mkString(sep) + sep
    }
    val cls =
      if (i >= 440) { if ((i - 440) % 10 == 9) 16 else 15 }
      else if (i >= 280) 14     // clean prose in the round-3/4 languages
      else if (i >= 240) 12 + (i % 2)
      else i % 12
    val text = cls match {
      case 15 => unsegmented(120 + rnd.nextInt(130))
      case 16 => // unsegmented keyword stuffing: a short chunk repeated
        (ws(rnd.nextInt(ws.length)) + ws(rnd.nextInt(ws.length))) * 40
      case 14 => sentence(40 + rnd.nextInt(300))
      case 12 => // boilerplate nav menu: duplicated link rows, no prose
        val items = Array("Home", "About", "Products", "Services", "Blog",
          "Careers", "Contact", "Login", "Register", "Privacy", "Terms")
        val menu = (0 until 6 + rnd.nextInt(5))
          .map(_ => items(rnd.nextInt(items.length))).mkString(" | ")
        (Seq.fill(4 + rnd.nextInt(3))(menu) :+
          "Copyright 2024 Example Corp All rights reserved").mkString("\n")
      case 13 => // code block: symbol-heavy, stopword-free
        val ids = Array("val", "def", "return", "if", "else", "for",
          "while", "int", "string", "foo", "bar", "baz", "qux", "result",
          "index", "count")
        (0 until 10 + rnd.nextInt(8)).map { k =>
          s"${ids(rnd.nextInt(ids.length))} ${ids(rnd.nextInt(ids.length))}$k" +
            s" = ${ids(rnd.nextInt(ids.length))}(${rnd.nextInt(100)}," +
            s" \"${ids(rnd.nextInt(ids.length))}\");"
        }.mkString("\n")
      case 9 => // too short
        sentence(3 + rnd.nextInt(5))
      case 10 => // symbol soup
        (0 until 40).map(_ => "@#$%^&*" (rnd.nextInt(7)).toString * (1 + rnd.nextInt(3)))
          .mkString(" ")
      case 11 if i % 24 == 11 => // empty / whitespace
        if (rnd.nextBoolean()) "" else "   \t  "
      case 11 => // keyword stuffing
        (ws(rnd.nextInt(ws.length)) + " ") * (60 + rnd.nextInt(40))
      case 8 => // duplicated lines
        val line = sentence(10)
        (Seq.fill(6)(line) ++ Seq(sentence(8))).mkString("\n")
      case 7 => // PII-laced prose
        sentence(60) +
          s" contact user$i@example.org or +1 555-12${i % 10}-4567," +
          s" ssn 123-45-678${i % 10}, card 4111 1111 1111 111${i % 10}," +
          s" server 10.0.${i % 256}.7 " + sentence(60)
      case 6 => // multi-byte + surrogate pairs
        sentence(50) + " 日本語テキスト 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 🚀 " + sentence(50)
      case _ => // clean prose, varying length
        sentence(40 + rnd.nextInt(300))
    }
    (s"https://fixture.example.com/doc/$i", text, lang)
  }

  def generate(spark: SparkSession, n: Int = 470): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.createDataset((0 until n).map(doc))
      .toDF("url", "text", "lang")
      .select(col("url"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("warc_ts"),
        encode(concat(lit("<html>"), col("text"), lit("</html>")), "UTF-8")
          .as("html"),
        col("text"), col("lang"))
  }
}
